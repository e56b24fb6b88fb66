from .audio import AudioInfo, read_audio, audio_info, write_wav

__all__ = ["AudioInfo", "read_audio", "audio_info", "write_wav"]
