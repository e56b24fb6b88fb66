"""JDCNet — Joint Detection and Classification network (Kum et al. 2019).

TPU-first re-design of the reference model (model.py:13-175):

- NHWC layout ``(B, T, F, C)`` (XLA:TPU's native conv layout) instead of the
  reference's NCHW; the time axis stays fully dynamic-free (static 192-frame
  crops in training, 192-frame chunks at inference).
- BatchNorm reduces over the *global* batch: under pjit with a batch-sharded
  input the mean/var are computed over the logical array, so data-parallel
  training sees cross-replica statistics by construction (SURVEY.md §7
  hard-part #5 — we pick global BN and document it here).
- The detector's ``.sum(axis=-1)`` collapse of its 2 logits into a single
  voicing logit is preserved verbatim for loss parity (reference
  model.py:117; SURVEY.md "preserve" quirk list).

Shape trace for the reference mel config (T frames, 80 mels):
  input (B, T, 80, 1)
  conv_block   -> (B, T, 80, 64)
  res_block1   -> (B, T, 40, 128)
  res_block2   -> (B, T, 20, 192)
  res_block3   -> (B, T, 10, 256)
  pool_block   -> (B, T, 2, 256)
  classifier: reshape (B, T, 512) -> SequenceModel -> Dense(num_class)
  detector:  maxpool skip concat (B, T, 2, 640) -> 1x1 conv (B, T, 2, 256)
             -> reshape (B, T, 512) -> SequenceModel -> Dense(2) -> sum(-1)
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax.numpy as jnp

import flax.linen as nn

from .init import kaiming_uniform, xavier_normal, zeros
from .sequence import _lstm_use_pallas, sequence_model_from_config


def activation_dtype_from(name):
    """Map a config string (``model_params.activation_dtype``) to a dtype.

    Accepts ``bfloat16``/``bf16`` (the TPU mixed-activation trunk), ``float32``/
    ``fp32``/empty (reference numerics).  New config key — the reference
    (model.py) is implicitly fp32 throughout."""
    if not name:
        return None
    key = str(name).lower()
    if key in ("bfloat16", "bf16"):
        return jnp.bfloat16
    if key in ("float32", "fp32", "f32"):
        return None
    raise ValueError(f"unsupported activation_dtype: {name!r}")


def _max_pool_freq(x, w: int):
    """Non-overlapping MaxPool(1, w) on the frequency axis of NHWC input.

    Forward-identical to ``nn.max_pool(x, (1, w), strides=(1, w))`` (the
    uncovered tail when F % w != 0 is dropped either way); the
    reshape+reduce-max forward fuses into the surrounding BN/LReLU chain
    (vs 7.3 ms/step of ``select-and-scatter`` backward, RESULTS.md leg-7
    trace).  The autodiff backward of this formulation is already
    layout-optimal: three replacements (Pallas lane-packed expansion,
    strided-slice compares, hand-written eq/count/select VJP) all measured
    equal or slower on the real chip — RESULTS.md leg-11 records the
    numbers so they are not retried blindly.  Tie gradients split among
    maxima instead of torch's first-index rule (subgradient choice only;
    forward parity is exact)."""
    f = x.shape[2]
    out_f = f // w
    if out_f * w != f:
        x = x[:, :, : out_f * w, :]
    x = x.reshape(x.shape[0], x.shape[1], out_f, w, x.shape[-1])
    return jnp.max(x, axis=3)


def _leaky_relu(x, slope):
    return nn.leaky_relu(x, negative_slope=slope)


class ConvBlock(nn.Module):
    """Input conv block (reference model.py:23-28).

    ``packed=True`` runs the mathematically-identical frequency-packed
    layout (models/freq_pack.py): input arrives packed ``(B, T, 40, 2)``
    and every C=64 activation lives as a lane-native ``(B, T, 40, 128)``
    tensor.  Parameter names/shapes are unchanged in both modes."""

    leaky_relu_slope: float = 0.01
    dtype: Optional[Any] = None
    packed: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.packed:
            from .freq_pack import PackedBatchNorm, PackedConv

            x = PackedConv(64, 1, dtype=self.dtype, name="conv1")(x)
            x = PackedBatchNorm(64, use_running_average=not train, dtype=self.dtype, name="bn")(x)
            x = _leaky_relu(x, self.leaky_relu_slope)
            return PackedConv(64, 64, dtype=self.dtype, name="conv2")(x)
        x = nn.Conv(64, (3, 3), padding=1, use_bias=False, kernel_init=xavier_normal, dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype, name="bn")(x)
        x = _leaky_relu(x, self.leaky_relu_slope)
        x = nn.Conv(64, (3, 3), padding=1, use_bias=False, kernel_init=xavier_normal, dtype=self.dtype, name="conv2")(x)
        return x


class ResBlock(nn.Module):
    """Pre-activation residual block with frequency-only max-pool
    (reference model.py:143-175)."""

    out_channels: int
    leaky_relu_slope: float = 0.01
    dtype: Optional[Any] = None
    # input arrives frequency-packed (models/freq_pack.py): run the exact
    # packed pre-activation; the MaxPool(1,2) of packed pairs lands the
    # result back in unpacked layout for the (already lane-native) convs
    packed_input: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.packed_input:
            from .freq_pack import PackedBatchNorm, maxpool2_packed

            c_in = x.shape[-1] // 2
            x = PackedBatchNorm(c_in, use_running_average=not train, dtype=self.dtype, name="pre_bn")(x)
            x = _leaky_relu(x, self.leaky_relu_slope)
            x = maxpool2_packed(x)
            in_channels = c_in
            downsample = in_channels != self.out_channels
        else:
            in_channels = x.shape[-1]
            downsample = in_channels != self.out_channels

            # BN / LReLU / MaxPool(1,2) on the frequency axis
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype, name="pre_bn")(x)
            x = _leaky_relu(x, self.leaky_relu_slope)
            x = _max_pool_freq(x, 2)

        h = nn.Conv(self.out_channels, (3, 3), padding=1, use_bias=False, kernel_init=xavier_normal, dtype=self.dtype, name="conv1")(x)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype, name="bn")(h)
        h = _leaky_relu(h, self.leaky_relu_slope)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, use_bias=False, kernel_init=xavier_normal, dtype=self.dtype, name="conv2")(h)

        if downsample:
            shortcut = nn.Conv(
                self.out_channels, (1, 1), use_bias=False, kernel_init=xavier_normal, dtype=self.dtype, name="conv1by1"
            )(x)
        else:
            shortcut = x
        return h + shortcut


class JDCNet(nn.Module):
    """Joint Detection and Classification Network (reference model.py:13-122).

    ``num_class == 1`` means direct F0 regression in Hz (the training default,
    reference train.py:89); larger values give per-frame pitch-class logits.
    """

    num_class: int = 1
    leaky_relu_slope: float = 0.01
    sequence_model_config: Optional[Dict[str, Any]] = None
    # Frequency-pair channel packing for the C=64 trunk levels
    # (models/freq_pack.py): exact same function, lane-native layout —
    # no 64->128 channel padding on the conv_block/res1-preact tensors.
    # Pure runtime layout choice; checkpoints are identical either way
    # (config: model_params.freq_pack).
    freq_pack: bool = False
    # Activation dtype for the convolutional trunk (None = float32).
    # ``jnp.bfloat16`` halves the HBM bytes of the conv + elementwise
    # categories, which the leg-9 trace measured as 50 + 36 ms of the
    # 113 ms device step at f32 (443 / 666 GB/s — bandwidth-bound).
    # Params stay float32 (flax casts per-call); BN statistics stay
    # float32 (flax ``_compute_stats`` forces f32 reductions); the
    # sequence heads and output Denses always run f32 (the Pallas LSTM
    # kernels bf16 their gate matmuls internally).
    dtype: Optional[Any] = None

    def setup(self):
        # setup-defined heads so the fused cross-head recurrence can reach
        # the individual LSTM layers of both (names stay
        # sequence_classifier / sequence_detector for checkpoint interop)
        self.sequence_classifier = sequence_model_from_config(self.sequence_model_config)
        self.sequence_detector = sequence_model_from_config(self.sequence_model_config)

    def _fused_heads(self, x_clf, x_det, train: bool):
        """Run both heads' BiLSTM stacks through one multichain Pallas kernel
        per layer (4 chains: clf-fwd, clf-bwd, det-fwd, det-bwd) — amortises
        the sequential per-step overhead across all four recurrences.

        Inputs/outputs are time-major (T, B, D): the whole fused stack stays
        in the kernels' native layout, eliminating the per-layer
        (B,T)<->(T,B) relayout copies the round-3 trace measured at
        ~1.5 ms/step (sequence.py:88 / jdc.py glue)."""
        from ..ops.lstm_pallas import (
            _use_dir_dma,
            multichain_lstm_dir,
            multichain_lstm_pallas,
        )
        from .sequence import _proj_bf16_active

        clf = self.sequence_classifier
        det = self.sequence_detector
        h_c, h_d = x_clf, x_det
        L = clf.num_layers
        lstm_dropout = clf.dropout if L > 1 else 0.0
        pb = _proj_bf16_active(train)
        dir_dma = _use_dir_dma()
        for k in range(L):
            cf, cb = clf.bilstm.layer_pair(k)
            df, db = det.bilstm.layer_pair(k)
            xp_cf, w_cf = cf(h_c, project_only=True, bf16_proj=pb, time_major=True)
            xp_cb, w_cb = cb(h_c, project_only=True, bf16_proj=pb, time_major=True)
            xp_df, w_df = df(h_d, project_only=True, bf16_proj=pb, time_major=True)
            xp_db, w_db = db(h_d, project_only=True, bf16_proj=pb, time_major=True)
            w4 = jnp.stack([w_cf, w_cb, w_df, w_db], axis=0)
            if dir_dma:
                # per-chain refs + direction-aware DMA: no flips, no pack
                # interleave — the kernel reads each projection in its own
                # time order and writes real-time-ordered outputs
                hs = multichain_lstm_dir(
                    (xp_cf, xp_cb, xp_df, xp_db), w4, dirs=(0, 1, 0, 1)
                )  # (T, 4, B, H) real time order
                h_c = jnp.concatenate([hs[:, 0], hs[:, 1]], axis=-1)
                h_d = jnp.concatenate([hs[:, 2], hs[:, 3]], axis=-1)
            else:
                xp4 = jnp.stack(
                    [xp_cf, jnp.flip(xp_cb, axis=0), xp_df, jnp.flip(xp_db, axis=0)],
                    axis=1,
                )  # (T, 4, B, 4H)
                hs = multichain_lstm_pallas(xp4, w4)  # (T, 4, B, H)
                h_c = jnp.concatenate([hs[:, 0], jnp.flip(hs[:, 1], axis=0)], axis=-1)
                h_d = jnp.concatenate([hs[:, 2], jnp.flip(hs[:, 3], axis=0)], axis=-1)
            if k < L - 1 and lstm_dropout > 0:
                h_c = clf.bilstm.inter_dropout(h_c, deterministic=not train)
                h_d = det.bilstm.inter_dropout(h_d, deterministic=not train)
        return h_c, h_d

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: (B, T, n_mels, 1) NHWC -> ((B, T, num_class), (B, T))."""
        slope = self.leaky_relu_slope
        seq_len = x.shape[1]
        B = x.shape[0]
        if self.dtype is not None:
            x = x.astype(self.dtype)

        if self.freq_pack:
            from .freq_pack import maxpool40_packed, pack_freq

            packed_out = ConvBlock(slope, dtype=self.dtype, packed=True, name="conv_block")(
                pack_freq(x), train=train
            )
            res1 = ResBlock(128, slope, dtype=self.dtype, packed_input=True, name="res_block1")(
                packed_out, train=train
            )
            convblock_out = None  # only consumed below via mp1
            mp1_packed = maxpool40_packed(packed_out)
        else:
            convblock_out = ConvBlock(slope, dtype=self.dtype, name="conv_block")(x, train=train)
            res1 = ResBlock(128, slope, dtype=self.dtype, name="res_block1")(convblock_out, train=train)
            mp1_packed = None
        res2 = ResBlock(192, slope, dtype=self.dtype, name="res_block2")(res1, train=train)
        res3 = ResBlock(256, slope, dtype=self.dtype, name="res_block3")(res2, train=train)

        # pool block: BN + LReLU + MaxPool(1,4) + Dropout(0.5)
        pool = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype, name="pool_bn")(res3)
        pool = _leaky_relu(pool, slope)
        pool = _max_pool_freq(pool, 4)
        pool = nn.Dropout(0.5, deterministic=not train, name="pool_dropout")(pool)
        # (B, T, 2, 256)

        # ---------------- fused-path decision (before the head-input build
        # so the fused path constructs time-major directly) ----------------
        clf = self.sequence_classifier
        # Cross-head fusion (C=4) is the default: the round-2 microbench
        # (tools/bench_lstm.py, real chip) measured forward recurrence
        # 11.7 ms vs 19.4 for per-head C=2 fusion, and 26.6 vs 35.7 fwd+bwd
        # with the Pallas BPTT backward.  ``PEX_DISABLE_FUSED4_LSTM`` opts
        # out (e.g. for narrow-VMEM parts).
        import os

        # VMEM guard: beyond the scoped-vmem budget fall back to the
        # per-head C=2 path (ops/lstm_pallas.pallas_vmem_fits)
        from ..ops.lstm_pallas import pallas_vmem_fits

        fused4_fits = pallas_vmem_fits(4, B, clf.hidden_size)
        fused4 = (
            not os.environ.get("PEX_DISABLE_FUSED4_LSTM")
            and _lstm_use_pallas()
            and fused4_fits
            and clf.model_type.lower() == "bilstm"
            and clf.bidirectional
            and __import__("pitchextractor_tpu.ops.lstm_pallas", fromlist=["lane_aligned"]).lane_aligned(clf.hidden_size)
        )

        # ---------------- sequence-head inputs ----------------
        # flatten channel-major to match the reference's permute(0,2,1,3)
        # .view(B, T, 512) ordering (model.py:93) — required for checkpoint
        # interop: NHWC (B,T,2,256) -> (B,T,256,2) -> (B,T,512).  The fused
        # path builds (T,B,512) instead (same single relayout) and stays
        # time-major through the whole head stack — see _fused_heads.
        def _head_in(h):
            if fused4:
                out = jnp.transpose(h, (1, 0, 3, 2)).reshape((seq_len, B, -1))
            else:
                out = jnp.swapaxes(h, 2, 3).reshape((B, seq_len, -1))
            # sequence heads + output Denses always run float32 (the Pallas
            # recurrence bf16s its gate matmuls internally; the loss wants f32)
            return out.astype(jnp.float32) if self.dtype is not None else out

        classifier_in = _head_in(pool)

        # auxiliary maxpools collapse frequency to 2 for the detector skip concat
        mp1 = mp1_packed if self.freq_pack else _max_pool_freq(convblock_out, 40)
        mp2 = _max_pool_freq(res1, 20)
        mp3 = _max_pool_freq(res2, 10)
        concat = jnp.concatenate([mp1, mp2, mp3, pool], axis=-1)  # (B, T, 2, 640)

        det = nn.Conv(256, (1, 1), use_bias=False, kernel_init=xavier_normal, dtype=self.dtype, name="detector_conv")(concat)
        det = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype, name="detector_bn")(det)
        det = _leaky_relu(det, slope)
        det = nn.Dropout(0.5, deterministic=not train, name="detector_dropout")(det)
        detector_in = _head_in(det)

        # ---------------- sequence heads ----------------
        if fused4:
            classifier_out, detector_out = self._fused_heads(classifier_in, detector_in, train)
        else:
            classifier_out = clf(classifier_in, train=train)
            detector_out = self.sequence_detector(detector_in, train=train)

        f0_pred = nn.Dense(
            self.num_class, kernel_init=kaiming_uniform, bias_init=zeros, name="classifier"
        )(classifier_out)
        detector_logits = nn.Dense(
            2, kernel_init=kaiming_uniform, bias_init=zeros, name="detector"
        )(detector_out)
        # single-logit collapse preserved for loss parity (model.py:117)
        voicing_logit = detector_logits.sum(axis=-1)
        if fused4:
            # the heads ran time-major; only the (T, B, few)-sized outputs
            # transpose back to batch-major
            f0_pred = jnp.swapaxes(f0_pred, 0, 1)  # (B, T, num_class)
            voicing_logit = jnp.swapaxes(voicing_logit, 0, 1)  # (B, T)

        return f0_pred, voicing_logit
