// In-process AAC encode+decode round trip via libavcodec.
//
// The reference's codec torture notebook shells out to an ffmpeg *binary*
// for its aac row (/root/reference/Utils/codec_and_bandwidth_torture.ipynb
// cells 4, 9: `-c:a aac -b:a {kbps}k`).  This image has no ffmpeg binary,
// but it ships libavcodec.so.59 — the library that binary would have
// called, including the very same native "aac" encoder/decoder pair.
// Binding the library directly (compiled against the real headers, so all
// AVCodecContext struct offsets are the ABI's own) gives the torture
// suite a REAL aac row in-process, closing the last ffmpeg-gated codec.
//
// C ABI consumed by pitchextractor_tpu/io/codecs_native.py via ctypes:
//   pexcodec_aac_available()                      -> 1 if enc+dec exist
//   pexcodec_aac_roundtrip(in, n, sr, kbps,
//                          out, out_cap, out_n)   -> 0 ok / negative error
// The output stream still carries the encoder's leading delay
// (initial_padding); the Python caller trims it by cross-correlation
// exactly as it does for the LAME and Opus paths, keeping all three
// real-codec rows on one alignment contract.

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavutil/channel_layout.h>
#include <libavutil/frame.h>
#include <libavutil/log.h>
#include <libavutil/mem.h>
#include <libavutil/opt.h>
}

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

// Keep libav's per-stream INFO chatter (e.g. the encoder's "Qavg" line)
// out of suite stdout/stderr; real errors still surface via return codes.
struct QuietLog {
    QuietLog() { av_log_set_level(AV_LOG_ERROR); }
} quiet_log_init;

struct EncoderOut {
    std::vector<std::vector<uint8_t>> packets;
    std::vector<uint8_t> extradata;
    int initial_padding = 0;
};

int drain_encoder(AVCodecContext* ctx, AVPacket* pkt, EncoderOut* out) {
    while (true) {
        int rc = avcodec_receive_packet(ctx, pkt);
        if (rc == AVERROR(EAGAIN) || rc == AVERROR_EOF) return 0;
        if (rc < 0) return rc;
        out->packets.emplace_back(pkt->data, pkt->data + pkt->size);
        av_packet_unref(pkt);
    }
}

int drain_decoder(AVCodecContext* ctx, AVFrame* frame, std::vector<float>* pcm) {
    while (true) {
        int rc = avcodec_receive_frame(ctx, frame);
        if (rc == AVERROR(EAGAIN) || rc == AVERROR_EOF) return 0;
        if (rc < 0) return rc;
        if (frame->format != AV_SAMPLE_FMT_FLTP || frame->ch_layout.nb_channels != 1) {
            av_frame_unref(frame);
            return -100;  // unexpected decode format: caller skips, never guesses
        }
        const float* data = reinterpret_cast<const float*>(frame->data[0]);
        pcm->insert(pcm->end(), data, data + frame->nb_samples);
        av_frame_unref(frame);
    }
}

int aac_encode(const float* in, int64_t n, int sr, int kbps, EncoderOut* out) {
    const AVCodec* codec = avcodec_find_encoder(AV_CODEC_ID_AAC);
    if (!codec) return -2;
    AVCodecContext* ctx = avcodec_alloc_context3(codec);
    if (!ctx) return -3;
    ctx->sample_rate = sr;
    ctx->sample_fmt = AV_SAMPLE_FMT_FLTP;
    ctx->bit_rate = static_cast<int64_t>(kbps) * 1000;
    av_channel_layout_default(&ctx->ch_layout, 1);
    // extradata (AudioSpecificConfig) is how the raw-packet decoder learns
    // the stream config — the in-memory equivalent of the .m4a container
    // metadata the ffmpeg CLI path would have written.
    ctx->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;

    AVFrame* frame = nullptr;
    AVPacket* pkt = nullptr;
    int rc = avcodec_open2(ctx, codec, nullptr);
    if (rc < 0) goto done;
    out->initial_padding = ctx->initial_padding;
    if (ctx->extradata && ctx->extradata_size > 0)
        out->extradata.assign(ctx->extradata, ctx->extradata + ctx->extradata_size);

    frame = av_frame_alloc();
    pkt = av_packet_alloc();
    if (!frame || !pkt) { rc = -3; goto done; }
    frame->format = AV_SAMPLE_FMT_FLTP;
    frame->sample_rate = sr;
    rc = av_channel_layout_copy(&frame->ch_layout, &ctx->ch_layout);
    if (rc < 0) goto done;

    {
        const int fs = ctx->frame_size > 0 ? ctx->frame_size : 1024;
        // Pad the tail with silence past the codec delay so the decoder can
        // emit every real input sample before the streams are flushed.
        const int64_t total = n + ctx->initial_padding + 2 * fs;
        int64_t pos = 0, pts = 0;
        while (pos < total) {
            const int m = static_cast<int>(total - pos < fs ? total - pos : fs);
            frame->nb_samples = m;
            rc = av_frame_get_buffer(frame, 0);
            if (rc < 0) goto done;
            rc = av_frame_make_writable(frame);
            if (rc < 0) goto done;
            float* dst = reinterpret_cast<float*>(frame->data[0]);
            for (int i = 0; i < m; ++i) {
                const int64_t src = pos + i;
                dst[i] = src < n ? in[src] : 0.0f;
            }
            frame->pts = pts;
            pts += m;
            rc = avcodec_send_frame(ctx, frame);
            if (rc < 0) goto done;
            rc = drain_encoder(ctx, pkt, out);
            if (rc < 0) goto done;
            av_frame_unref(frame);
            frame->format = AV_SAMPLE_FMT_FLTP;
            frame->sample_rate = sr;
            if ((rc = av_channel_layout_copy(&frame->ch_layout, &ctx->ch_layout)) < 0)
                goto done;
            pos += m;
        }
        rc = avcodec_send_frame(ctx, nullptr);  // flush
        if (rc < 0) goto done;
        rc = drain_encoder(ctx, pkt, out);
    }

done:
    av_frame_free(&frame);
    av_packet_free(&pkt);
    avcodec_free_context(&ctx);
    return rc < 0 ? rc : 0;
}

int aac_decode(const EncoderOut& enc, int sr, std::vector<float>* pcm) {
    const AVCodec* codec = avcodec_find_decoder(AV_CODEC_ID_AAC);
    if (!codec) return -2;
    AVCodecContext* ctx = avcodec_alloc_context3(codec);
    if (!ctx) return -3;
    ctx->sample_rate = sr;
    av_channel_layout_default(&ctx->ch_layout, 1);
    if (!enc.extradata.empty()) {
        ctx->extradata = static_cast<uint8_t*>(
            av_mallocz(enc.extradata.size() + AV_INPUT_BUFFER_PADDING_SIZE));
        if (!ctx->extradata) { avcodec_free_context(&ctx); return -3; }
        std::memcpy(ctx->extradata, enc.extradata.data(), enc.extradata.size());
        ctx->extradata_size = static_cast<int>(enc.extradata.size());
    }

    AVFrame* frame = nullptr;
    AVPacket* pkt = nullptr;
    int rc = avcodec_open2(ctx, codec, nullptr);
    if (rc < 0) goto done;
    frame = av_frame_alloc();
    pkt = av_packet_alloc();
    if (!frame || !pkt) { rc = -3; goto done; }

    for (const auto& bytes : enc.packets) {
        uint8_t* buf = static_cast<uint8_t*>(
            av_mallocz(bytes.size() + AV_INPUT_BUFFER_PADDING_SIZE));
        if (!buf) { rc = -3; goto done; }
        std::memcpy(buf, bytes.data(), bytes.size());
        rc = av_packet_from_data(pkt, buf, static_cast<int>(bytes.size()));
        if (rc < 0) { av_free(buf); goto done; }
        rc = avcodec_send_packet(ctx, pkt);
        av_packet_unref(pkt);
        if (rc < 0) goto done;
        rc = drain_decoder(ctx, frame, pcm);
        if (rc < 0) goto done;
    }
    rc = avcodec_send_packet(ctx, nullptr);  // flush
    if (rc < 0 && rc != AVERROR_EOF) goto done;
    rc = drain_decoder(ctx, frame, pcm);

done:
    av_frame_free(&frame);
    av_packet_free(&pkt);
    avcodec_free_context(&ctx);
    return rc < 0 ? rc : 0;
}

}  // namespace

extern "C" {

int32_t pexcodec_aac_available(void) {
    return avcodec_find_encoder(AV_CODEC_ID_AAC) != nullptr &&
                   avcodec_find_decoder(AV_CODEC_ID_AAC) != nullptr
               ? 1
               : 0;
}

// Round-trip `in[0..n)` (mono float32, [-1,1]) through AAC at `kbps`.
// Writes up to `out_cap` decoded samples to `out`, the true decoded count
// (pre-truncation) to `*out_n`, and the encoder's reported leading delay
// in samples to `*delay`.  Returns 0 on success, negative on any failure.
int32_t pexcodec_aac_roundtrip(const float* in, int64_t n, int32_t sr,
                               int32_t kbps, float* out, int64_t out_cap,
                               int64_t* out_n, int32_t* delay) {
    if (!in || !out || !out_n || n <= 0 || sr <= 0 || kbps <= 0) return -1;
    EncoderOut enc;
    int rc = aac_encode(in, n, sr, kbps, &enc);
    if (rc < 0) return rc;
    if (enc.packets.empty()) return -4;
    std::vector<float> pcm;
    pcm.reserve(static_cast<size_t>(n) + 8192);
    rc = aac_decode(enc, sr, &pcm);
    if (rc < 0) return rc;
    if (pcm.empty()) return -5;
    *out_n = static_cast<int64_t>(pcm.size());
    if (delay) *delay = enc.initial_padding;
    const int64_t m = static_cast<int64_t>(pcm.size()) < out_cap
                          ? static_cast<int64_t>(pcm.size())
                          : out_cap;
    std::memcpy(out, pcm.data(), static_cast<size_t>(m) * sizeof(float));
    return 0;
}

}  // extern "C"
