from .audio import AudioDecodeError, AudioInfo, read_audio, audio_info, write_wav

__all__ = ["AudioDecodeError", "AudioInfo", "read_audio", "audio_info", "write_wav"]
