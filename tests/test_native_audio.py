"""Native C++ audio IO vs Python/scipy oracles."""

import io

import numpy as np
import pytest

from speech_transcript_embeddings_tpu.data import native_audio


@pytest.fixture(scope="module")
def lib():
    lib = native_audio.get_lib()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def _wav_bytes(wav: np.ndarray, sr: int, dtype) -> bytes:
    from scipy.io import wavfile
    buf = io.BytesIO()
    if dtype == np.int16:
        data = (np.clip(wav, -1, 1) * 32767).astype(np.int16)
    elif dtype == np.float32:
        data = wav.astype(np.float32)
    else:
        raise ValueError(dtype)
    wavfile.write(buf, sr, data)
    return buf.getvalue()


def test_decode_wav_pcm16(lib):
    rng = np.random.default_rng(0)
    wav = rng.normal(scale=0.3, size=4000).astype(np.float32)
    data = _wav_bytes(wav, 16000, np.int16)
    got, sr = native_audio.decode_wav(data)
    assert sr == 16000 and len(got) == 4000
    np.testing.assert_allclose(got, np.clip(wav, -1, 1) * 32767 / 32768,
                               atol=1.0 / 32768)


def test_decode_wav_float32_stereo(lib):
    rng = np.random.default_rng(1)
    wav = rng.normal(scale=0.3, size=(2000, 2)).astype(np.float32)
    data = _wav_bytes(wav, 22050, np.float32)
    got, sr = native_audio.decode_wav(data)
    assert sr == 22050 and len(got) == 2000
    np.testing.assert_allclose(got, wav.mean(axis=1), atol=1e-6)


def test_decode_wav_malformed_raises(lib):
    with pytest.raises(Exception):
        native_audio.decode_wav(b"not a wav at all")


def test_resample_preserves_tone(lib):
    sr_in, sr_out = 48000, 16000
    t = np.arange(sr_in) / sr_in
    wav = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    out = native_audio.resample(wav, sr_in, sr_out)
    assert abs(len(out) - sr_out) <= 2
    # dominant frequency must still be 440 Hz
    spec = np.abs(np.fft.rfft(out[: sr_out]))
    peak_hz = np.argmax(spec[5:]) + 5
    assert abs(peak_hz - 440) <= 2
    # amplitude roughly preserved away from edges
    assert 0.8 < np.abs(out[100:-100]).max() < 1.2


def test_pad_batch_matches_python(lib):
    rng = np.random.default_rng(2)
    clips = [rng.normal(scale=s, size=n).astype(np.float32)
             for s, n in ((0.5, 1000), (2.0, 500), (0.1, 2100))]
    out_n, cnt_n = native_audio.pad_batch(clips, bucket=2000)

    # python oracle
    out_p = np.zeros((3, 2000), np.float32)
    cnt_p = np.zeros(3, np.int32)
    for i, c in enumerate(clips):
        c = c[:2000]
        peak = np.abs(c).max()
        if peak > 1.0:
            c = c / peak
        out_p[i, : len(c)] = c
        cnt_p[i] = len(c)
    np.testing.assert_array_equal(cnt_n, cnt_p)
    np.testing.assert_allclose(out_n, out_p, rtol=1e-6, atol=1e-7)
