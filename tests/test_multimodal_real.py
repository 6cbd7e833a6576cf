"""Real multimodal decode: clean-room PPM/PGM/BMP and PCM WAV parsers,
bilinear resize, and the real-featured actor-pool pipeline."""

import numpy as np
import pytest

import ray
import ray.data

from dedupe_api_ray.extras.multimodal import (AUDIO_FEATURE_DIM,
                                              IMAGE_FEATURE_DIM,
                                              audio_features,
                                              decode_audio, decode_image,
                                              encode_bmp, encode_pgm,
                                              encode_ppm, encode_wav,
                                              extract_media_features,
                                              image_features,
                                              make_real_media_table,
                                              resize_bilinear)


def _img(h=13, w=17, seed=0):
    return np.random.RandomState(seed).randint(
        0, 256, size=(h, w, 3)).astype(np.uint8)


def test_ppm_roundtrip_exact():
    img = _img()
    assert np.array_equal(decode_image(encode_ppm(img)), img)


def test_pgm_roundtrip_exact():
    g = _img()[:, :, 0]
    assert np.array_equal(decode_image(encode_pgm(g)), g)


def test_ppm_header_comments_parsed():
    img = _img(4, 4)
    raw = encode_ppm(img)
    commented = raw.replace(b"P6\n", b"P6\n# a comment line\n", 1)
    assert np.array_equal(decode_image(commented), img)


def test_bmp_roundtrip_exact_with_row_padding():
    # width 17 → 51-byte rows padded to 52: exercises the 4-byte pad
    img = _img(13, 17)
    assert np.array_equal(decode_image(encode_bmp(img)), img)


def test_wav_roundtrip_close():
    sr = 8000
    t = np.arange(1600) / sr
    x = 0.5 * np.sin(2 * np.pi * 440.0 * t)
    got, got_sr = decode_audio(encode_wav(x, sr))
    assert got_sr == sr
    assert len(got) == len(x)
    assert np.abs(got - x).max() < 1.5 / 32768  # 16-bit quantization

def test_compressed_codecs_still_raise():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG\r\n\x1a\n....", "image/png")
    with pytest.raises(NotImplementedError):
        decode_audio(b"ID3\x04....", "audio/mpeg")


def test_resize_bilinear_shapes_and_constants():
    img = _img(16, 24)
    out = resize_bilinear(img, 8, 12)
    assert out.shape == (8, 12, 3) and out.dtype == np.uint8
    flat = np.full((10, 10, 3), 77, dtype=np.uint8)
    assert (resize_bilinear(flat, 5, 7) == 77).all()  # constant-preserving
    g = img[:, :, 0]
    assert resize_bilinear(g, 32, 48).shape == (32, 48)
    # identity resize returns the same pixels
    assert np.array_equal(resize_bilinear(img, 16, 24), img)


def test_image_features_shape_and_values():
    f = image_features(_img())
    assert f.shape == (IMAGE_FEATURE_DIM,)
    assert abs(f[6:].sum() - 1.0) < 1e-9  # histogram L1-normalized
    white = image_features(np.full((8, 8, 3), 255, dtype=np.uint8))
    assert np.allclose(white[:3], 1.0) and np.allclose(white[3:6], 0.0)


def test_audio_features_tone_band():
    sr = 8000
    t = np.arange(4096) / sr
    x = 0.5 * np.sin(2 * np.pi * 300.0 * t)  # 300 Hz → lowest FFT band
    f = audio_features(x, sr)
    assert f.shape == (AUDIO_FEATURE_DIM,)
    assert abs(f[0] - 0.5 / np.sqrt(2)) < 1e-3  # RMS of a sine
    assert f[2] > 0.95  # energy concentrated in band 0


def test_real_pipeline_over_ray(ray_session):
    media = make_real_media_table(n=24)
    ds = ray.data.from_arrow(media)
    out = extract_media_features(ds, fake=False, batch_size=8).to_pandas()
    assert len(out) == 24
    by_type = dict(zip(out["media_id"], out["feature"]))
    types = dict(zip(out["media_id"], out["media_type"]))
    for mid, feat in by_type.items():
        want = AUDIO_FEATURE_DIM if types[mid].startswith("audio") \
            else IMAGE_FEATURE_DIM
        assert len(feat) == want
    # deterministic across batch sizes / parallelism
    out2 = extract_media_features(ds, fake=False, batch_size=5).to_pandas()
    m1 = dict(zip(out["media_id"], map(tuple, out["feature"])))
    m2 = dict(zip(out2["media_id"], map(tuple, out2["feature"])))
    assert m1 == m2


def test_riff_image_payload_raises_not_implemented():
    """A RIFF-container IMAGE (e.g. WebP) must not fall into the WAV
    parser and leak a raw wave.Error: media_type routes first, and any
    wave.Error is wrapped into NotImplementedError."""
    import pytest

    from dedupe_api_ray.extras.multimodal import MediaDecoder

    webp_ish = b"RIFF" + (1000).to_bytes(4, "little") + b"WEBPVP8 " + b"\x00" * 64
    dec = MediaDecoder(fake=False)
    with pytest.raises(NotImplementedError):
        dec._decode(webp_ish, "image/webp")
    # unknown media_type + RIFF/WAVE magic still routes to audio
    from dedupe_api_ray.extras.multimodal import encode_wav
    import numpy as np

    wav = encode_wav(np.zeros(1600), 16000)
    feats = dec._decode(wav, "")
    assert feats.shape[0] > 0
