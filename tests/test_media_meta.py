"""Multimodal kernels: WAV codec, OGVF container, header sniffing."""

import numpy as np
import pytest

from ocr_gang_spark.atlas import render_page
from ocr_gang_spark.kernels.bmp import encode_bmp, encode_media_blob
from ocr_gang_spark.kernels.media_meta import (
    audio_features,
    decode_wav,
    encode_video,
    encode_wav,
    sample_frames,
    sniff_media_meta,
    synth_audio_blob,
    synth_video_blob,
    video_frame_index,
)
from ocr_gang_spark.kernels.png import encode_png


def test_wav_round_trip():
    rng = np.random.default_rng(1)
    samples = (rng.standard_normal(4321) * 10000).astype(np.int16)
    rate, back = decode_wav(encode_wav(samples, 22050))
    assert rate == 22050 and np.array_equal(back, samples)


def test_wav_rejects_garbage_and_stereo():
    with pytest.raises(ValueError):
        decode_wav(b"RIFFxxxxNOPE")
    import struct

    # stereo header
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 40, b"WAVE", b"fmt ", 16, 1, 2, 16000, 64000, 4, 16, b"data", 4,
    )
    with pytest.raises(ValueError, match="unsupported WAV"):
        decode_wav(hdr + b"\x00" * 4)


def test_audio_features_known_signal():
    # a full-scale square wave at 1/4 the sample rate: rms = amplitude,
    # signbit alternates every 2 samples -> zcr ~ 0.5
    x = np.tile(np.array([1000, 1000, -1000, -1000], dtype=np.int16), 100)
    n, dur, rms, zcr = audio_features(x, 16000)
    assert n == 400 and dur == 400 / 16000
    assert rms == 1000.0
    assert abs(zcr - 0.5) < 0.01


def test_video_container_round_trip():
    rng = np.random.default_rng(2)
    frames = [rng.integers(0, 256, (16, 12, 3), dtype=np.uint8) for _ in range(5)]
    blob = encode_video(frames)
    assert sniff_media_meta(blob) == ("ogvf", 12, 16)
    assert len(video_frame_index(blob)) == 5
    sampled = dict(sample_frames(blob, stride=2))
    assert sorted(sampled) == [0, 2, 4]
    for i, f in sampled.items():
        assert np.array_equal(f, frames[i])


def test_sniff_all_formats():
    page, _ = render_page("Zz", key="sniff")
    h, w = page.shape[:2]
    assert sniff_media_meta(encode_bmp(page)) == ("bmp", w, h)
    assert sniff_media_meta(encode_png(page)) == ("png", w, h)
    assert sniff_media_meta(encode_media_blob(page)) == ("bmp-zlib", w, h)
    assert sniff_media_meta(b"\xff\xd8\xff\xe0rest")[0] == "jpeg"
    assert sniff_media_meta(synth_audio_blob("a"))[0] == "wav"
    assert sniff_media_meta(b"????junk")[0] == "unknown"


def test_synth_blobs_deterministic():
    assert synth_audio_blob("x") == synth_audio_blob("x")
    assert synth_video_blob("y") == synth_video_blob("y")
    assert synth_audio_blob("x") != synth_audio_blob("x2")
