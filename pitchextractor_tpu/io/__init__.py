from .audio import AudioDecodeError, AudioInfo, read_audio, audio_info, write_wav
from .flac import read_flac, write_flac

__all__ = [
    "AudioDecodeError",
    "AudioInfo",
    "read_audio",
    "audio_info",
    "write_wav",
    "read_flac",
    "write_flac",
]
