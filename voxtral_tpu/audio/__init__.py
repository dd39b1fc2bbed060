from voxtral_tpu.audio.mel import (
    mel_filters, batch_log_mel, batch_log_mel_jax, MelStream, pad_audio_offline,
)
from voxtral_tpu.audio.wav import (
    load_audio, load_wav, parse_wav_bytes, resample_linear)

__all__ = [
    "mel_filters", "batch_log_mel", "batch_log_mel_jax", "MelStream",
    "pad_audio_offline", "load_audio", "load_wav", "parse_wav_bytes", "resample_linear",
]
