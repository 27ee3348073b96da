"""Minimal WAV (RIFF PCM) codec + audio feature DSP — pure stdlib
struct + numpy (public RIFF/WAVE format docs; the container has no
audio libraries but PCM needs none).

Scope: uncompressed PCM (format tag 1), 8-bit unsigned / 16-bit signed,
any channel count. Features are classic numpy DSP: RMS energy,
zero-crossing rate, dominant frequency via rFFT — real kernels, not
stubs, so the multimodal audio path is decode→feature end-to-end.
"""

from __future__ import annotations

import struct

import numpy as np


def wav_encode(rate: int, samples: np.ndarray) -> bytes:
    """(n,) or (n, channels) int16 (or float in [-1, 1]) → RIFF/WAVE
    PCM-16 bytes."""
    arr = np.asarray(samples)
    if arr.dtype.kind == "f":
        arr = np.clip(arr, -1.0, 1.0)
        arr = (arr * 32767.0).round().astype(np.int16)
    arr = np.ascontiguousarray(arr, dtype=np.int16)
    if arr.ndim == 1:
        arr = arr[:, None]
    n, channels = arr.shape
    data = arr.reshape(-1).tobytes()
    fmt = struct.pack("<HHIIHH", 1, channels, rate,
                      rate * channels * 2, channels * 2, 16)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_decode(data: bytes) -> tuple[int, np.ndarray]:
    """RIFF/WAVE PCM → (rate, float64 array (n, channels) in [-1, 1])."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, rate, channels, bits, raw = 12, None, None, None, None
    while pos + 8 <= len(data):
        tag = data[pos:pos + 4]
        (ln,) = struct.unpack("<I", data[pos + 4:pos + 8])
        body = data[pos + 8:pos + 8 + ln]
        if tag == b"fmt ":
            ftag, channels, rate, _, _, bits = struct.unpack(
                "<HHIIHH", body[:16])
            if ftag != 1:
                raise ValueError(f"only PCM WAV supported (fmt {ftag})")
        elif tag == b"data":
            raw = body
        pos += 8 + ln + (ln & 1)
    if rate is None or raw is None:
        raise ValueError("corrupt WAV (missing fmt/data chunk)")
    if bits == 16:
        arr = np.frombuffer(raw, np.int16).astype(np.float64) / 32768.0
    elif bits == 8:
        arr = (np.frombuffer(raw, np.uint8).astype(np.float64)
               - 128.0) / 128.0
    else:
        raise ValueError(f"only 8/16-bit PCM supported (got {bits})")
    n = len(arr) // channels
    return int(rate), arr[:n * channels].reshape(n, channels)


def audio_features(data: bytes) -> dict:
    """Decode + classic DSP features of the mixed-down signal:
    duration, RMS, zero-crossing rate (per second), dominant frequency
    (rFFT argmax, DC excluded)."""
    rate, samples = wav_decode(data)
    mono = samples.mean(axis=1)
    n = len(mono)
    if n == 0:
        return {"rate": rate, "duration_s": 0.0, "rms": 0.0,
                "zcr_hz": 0.0, "dominant_hz": 0.0}
    rms = float(np.sqrt(np.mean(mono ** 2)))
    crossings = int(np.count_nonzero(np.diff(np.signbit(mono))))
    spec = np.abs(np.fft.rfft(mono))
    spec[0] = 0.0                           # ignore DC
    dom = float(np.argmax(spec) * rate / n)
    return {"rate": rate, "duration_s": n / rate, "rms": rms,
            "zcr_hz": crossings / (n / rate), "dominant_hz": dom}
