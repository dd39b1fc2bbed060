"""CLI end-to-end smoke tests (subprocess, CPU, tiny random-init model):
the -i file path and the --stdin path must both run the full engine and
print a deterministic token-id transcript to stdout."""

import os
import struct
import subprocess
import sys

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _wav_bytes(samples: np.ndarray, rate=16000) -> bytes:
    pcm = (np.clip(samples, -1, 1) * 32767).astype("<i2").tobytes()
    hdr = (b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVEfmt "
           + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
           + b"data" + struct.pack("<I", len(pcm)))
    return hdr + pcm


@pytest.fixture(scope="module")
def noise_wav(tmp_path_factory):
    # 2 s of noise with seed-7 weights in f32 (--parity) is a combination
    # verified to greedy-decode TEXT tokens — random tiny models are
    # degenerate (most seeds/audio collapse to a single control token, which
    # would make the non-empty-stdout assertion impossible)
    rng = np.random.RandomState(21)
    data = _wav_bytes((rng.randn(2 * 16000) * 0.3).astype(np.float32))
    p = tmp_path_factory.mktemp("cli") / "noise.wav"
    p.write_bytes(data)
    return str(p), data


def _run(extra, stdin_data=None, timeout=600):
    cmd = [sys.executable, "-m", "voxtral_tpu.cli", "--cpu",
           "--parity", "--tiny", "--random-init", "7", "--silent"] + extra
    return subprocess.run(cmd, cwd=ROOT, input=stdin_data,
                          capture_output=True, timeout=timeout)


def test_cli_file_input(noise_wav):
    path, _ = noise_wav
    r = _run(["-i", path, "-I", "1.0"])
    assert r.returncode == 0, r.stderr.decode()
    out = r.stdout.decode().strip()
    assert out, "no transcript on stdout"
    # without a tokenizer the CLI prints token ids — deterministic per seed
    r2 = _run(["-i", path, "-I", "1.0"])
    assert r2.stdout == r.stdout


def test_cli_stdin_wav_header_skip(noise_wav):
    """--stdin sniffs and skips the RIFF header (main.c:304-340) and must
    produce the same tokens as the file path at the same interval."""
    path, data = noise_wav
    r_file = _run(["-i", path, "-I", "1.0"])
    r_stdin = _run(["--stdin", "-I", "1.0"], stdin_data=data)
    assert r_stdin.returncode == 0, r_stdin.stderr.decode()
    assert r_stdin.stdout.decode().strip()
    assert r_stdin.stdout == r_file.stdout


def test_cli_alt_format(noise_wav):
    """--alt runs the top-k logit path end-to-end; output still non-empty."""
    path, _ = noise_wav
    r = _run(["-i", path, "-I", "1.0", "--alt", "0.99"])
    assert r.returncode == 0, r.stderr.decode()
    assert r.stdout.decode().strip()
