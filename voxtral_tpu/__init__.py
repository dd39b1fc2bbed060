"""voxtral_tpu: TPU-native streaming ASR for Voxtral Realtime 4B.

Top-level convenience API, mirroring the reference's vox_load /
vox_transcribe / vox_transcribe_audio (voxtral.h:249-337):

    import voxtral_tpu as vox
    engine = vox.load("model_dir")              # (params, cfg, tokenizer)
    text = vox.transcribe(engine, "speech.wav")
    text = vox.transcribe_audio(engine, samples_16khz_f32)

Stream / fleet surfaces: voxtral_tpu.runtime.VoxStream (single stream,
reference-parity engine) and voxtral_tpu.runtime.manager.FleetManager
(multi-stream production serving).
"""

from __future__ import annotations

__version__ = "0.1.0"


def load(model_dir: str, *, dtype=None, quantize: bool = False):
    """Load weights + tokenizer. Returns (params, cfg, tokenizer).
    Q8 files are detected per tensor; quantize=True Q8-ifies bf16 weights
    on device after loading (halves HBM)."""
    import os

    import jax.numpy as jnp

    from voxtral_tpu.config import voxtral_4b
    from voxtral_tpu.tokenizer import Tokenizer
    from voxtral_tpu.weights import load_params

    dt = dtype or jnp.bfloat16
    cfg = voxtral_4b(param_dtype=dt, compute_dtype=dt)
    params = load_params(
        os.path.join(model_dir, "consolidated.safetensors"), cfg)
    if quantize:
        from voxtral_tpu.quant import quantize_params
        params = quantize_params(params)
    tok_path = os.path.join(model_dir, "tekken.json")
    tokenizer = Tokenizer(tok_path) if os.path.exists(tok_path) else None
    return params, cfg, tokenizer


def transcribe_audio(engine, samples, *, interval: float = 2.0,
                     delay_ms: int = 480) -> str:
    """Transcribe 16 kHz mono f32 samples through the streaming engine."""
    params, cfg, tokenizer = engine
    from voxtral_tpu.runtime import StreamConfig, VoxStream
    s = VoxStream(params, cfg, tokenizer=tokenizer,
                  stream_cfg=StreamConfig(interval=interval,
                                          delay_tokens=delay_ms // 80))
    sr = cfg.audio.sample_rate
    for i in range(0, len(samples), sr):
        s.feed(samples[i:i + sr])
    s.finish()
    return "".join(s.get()).strip()


def transcribe(engine, path: str, **kw) -> str:
    """Transcribe an audio file (WAV; other formats via ffmpeg if present)."""
    import os
    import shutil
    import subprocess

    from voxtral_tpu.audio import load_wav
    params, cfg, _ = engine
    if path.lower().endswith(".wav"):
        audio = load_wav(path, cfg.audio.sample_rate)
    elif shutil.which("ffmpeg"):
        out = subprocess.run(
            ["ffmpeg", "-loglevel", "quiet", "-i", path, "-f", "s16le",
             "-ar", str(cfg.audio.sample_rate), "-ac", "1", "-"],
            capture_output=True, check=True).stdout
        import numpy as np
        audio = np.frombuffer(out, dtype="<i2").astype(np.float32) / 32768.0
    else:
        raise ValueError(f"cannot decode {path!r} (need WAV or ffmpeg)")
    return transcribe_audio(engine, audio, **kw)
