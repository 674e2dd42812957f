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

def test_decode_audio_wav_dispatch(lib):
    rng = np.random.default_rng(5)
    wav = rng.normal(scale=0.3, size=3000).astype(np.float32)
    got, sr = native_audio.decode_audio(_wav_bytes(wav, 16000, np.float32))
    assert sr == 16000
    np.testing.assert_allclose(got, wav, atol=1e-6)


def _compressed_backend_available() -> bool:
    import shutil
    try:
        import soundfile  # noqa: F401
        return True
    except ImportError:
        return shutil.which("ffmpeg") is not None


def test_decode_audio_compressed_fallback_chain():
    """mp3-style bytes route to soundfile/ffmpeg; with neither installed the
    error names the missing backends (this environment has neither — the
    deploy image ships ffmpeg, so there the same bytes decode)."""
    fake_mp3 = b"ID3\x04\x00\x00\x00\x00\x00\x00" + b"\xff\xfb\x90\x00" * 32
    if _compressed_backend_available():
        # a garbage frame body may still decode (to silence) or raise a decode
        # error mentioning the file — either way the chain engaged
        try:
            wav, sr = native_audio.decode_audio(fake_mp3, "fake.mp3")
            assert sr > 0
        except RuntimeError as e:
            assert "fake.mp3" in str(e)
    else:
        with pytest.raises(RuntimeError, match="soundfile|ffmpeg"):
            native_audio.decode_audio(fake_mp3, "fake.mp3")


def test_wav_header_num_samples(tmp_path, lib):
    from speech_transcript_embeddings_tpu.data.sources import (
        _wav_header_num_samples,
    )
    rng = np.random.default_rng(6)
    wav = rng.normal(scale=0.3, size=(1234, 2)).astype(np.float32)
    p = tmp_path / "x.wav"
    p.write_bytes(_wav_bytes(wav, 22050, np.float32))
    frames, sr = _wav_header_num_samples(str(p))
    assert (frames, sr) == (1234, 22050)
    assert _wav_header_num_samples(str(tmp_path / "missing.wav")) is None
    q = tmp_path / "not.wav"
    q.write_bytes(b"junkjunkjunkjunk")
    assert _wav_header_num_samples(str(q)) is None
    # streaming placeholder data sizes (ffmpeg-to-pipe WAVs) are untrustworthy
    import struct
    raw = bytearray(_wav_bytes(wav, 22050, np.float32))
    data_at = bytes(raw).index(b"data")
    for placeholder in (0, 0xFFFFFFFF):
        raw[data_at + 4: data_at + 8] = struct.pack("<I", placeholder)
        r = tmp_path / "ph.wav"
        r.write_bytes(bytes(raw))
        assert _wav_header_num_samples(str(r)) is None
