"""Real MP4 demuxing for the video-dedup frame seam (r10):
hand-built ISO BMFF containers (pure struct packing — no codec libs in
the container STRUCTURE either) drive the sample-table parser and the
mapInPandas slicer, including the co64/fixed-stsz variants, the
multi-trak handler pick, and the end-to-end near-dup integration
through the frame_slicer= injection seam."""

import struct

import pytest

from matcha_spark.operators.demux import mp4_frame_slicer, parse_mp4_samples


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I4s", 8 + len(payload), btype) + payload


def _full(btype: bytes, payload: bytes) -> bytes:
    return _box(btype, b"\x00\x00\x00\x00" + payload)


def build_mp4(
    samples,
    chunks=None,
    fixed_size=None,
    wide_offsets=False,
    extra_trak_first=False,
):
    """Minimal valid-enough ISO BMFF file: ftyp + mdat + moov, with the
    three mandatory stbl atoms.  ``chunks`` = list of per-chunk sample
    counts (default: all samples in one chunk)."""
    chunks = chunks or [len(samples)]
    assert sum(chunks) == len(samples)
    ftyp = _box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
    mdat = _box(b"mdat", b"".join(samples))
    data_off = len(ftyp) + 8  # absolute offset of the first sample

    # chunk offsets
    offsets, si, off = [], 0, data_off
    for n in chunks:
        offsets.append(off)
        for _ in range(n):
            off += len(samples[si])
            si += 1
    if wide_offsets:
        stco = _full(
            b"co64",
            struct.pack(">I", len(offsets))
            + b"".join(struct.pack(">Q", o) for o in offsets),
        )
    else:
        stco = _full(
            b"stco",
            struct.pack(">I", len(offsets))
            + b"".join(struct.pack(">I", o) for o in offsets),
        )
    if fixed_size is not None:
        stsz = _full(b"stsz", struct.pack(">II", fixed_size, len(samples)))
    else:
        stsz = _full(
            b"stsz",
            struct.pack(">II", 0, len(samples))
            + b"".join(struct.pack(">I", len(s)) for s in samples),
        )
    # stsc runs: one entry at chunk i+1 whenever samples-per-chunk changes
    ents = []
    for i, n in enumerate(chunks):
        if i == 0 or n != chunks[i - 1]:
            ents.append((i + 1, n))
    stsc = _full(
        b"stsc",
        struct.pack(">I", len(ents))
        + b"".join(struct.pack(">III", fc, n, 1) for fc, n in ents),
    )
    def trak(handler: bytes) -> bytes:
        hdlr = _full(b"hdlr", b"\x00" * 4 + handler + b"\x00" * 12 + b"\x00")
        stbl = _box(b"stbl", stsz + stsc + stco)
        minf = _box(b"minf", stbl)
        mdia = _box(b"mdia", hdlr + minf)
        return _box(b"trak", mdia)

    traks = trak(b"vide")
    if extra_trak_first:
        traks = trak(b"soun") + traks
    moov = _box(b"moov", traks)
    return ftyp + mdat + moov


SAMPLES = [b"frame-zero-bytes!", b"fr1", b"frame-two-is-a-bit-longer", b"f3!"]


def test_parse_mp4_samples_ranges():
    mp4 = build_mp4(SAMPLES, chunks=[2, 1, 1])
    ranges = parse_mp4_samples(mp4)
    assert [mp4[o : o + s] for o, s in ranges] == SAMPLES


def test_parse_mp4_fixed_size_and_co64():
    fixed = [b"eightby!", b"12345678", b"abcdefgh"]
    mp4 = build_mp4(fixed, fixed_size=8, wide_offsets=True)
    ranges = parse_mp4_samples(mp4)
    assert [mp4[o : o + s] for o, s in ranges] == fixed


def test_parse_mp4_picks_video_trak():
    mp4 = build_mp4(SAMPLES, extra_trak_first=True)
    ranges = parse_mp4_samples(mp4)
    assert [mp4[o : o + s] for o, s in ranges] == SAMPLES


def test_parse_mp4_malformed_raises():
    with pytest.raises(ValueError):
        parse_mp4_samples(b"not an mp4 at all")
    mp4 = bytearray(build_mp4(SAMPLES))
    mp4[4:8] = b"zzzz"  # clobber ftyp type: harmless
    # clobber a box SIZE inside moov -> structural failure
    with pytest.raises(ValueError):
        parse_mp4_samples(bytes(mp4[: len(mp4) - 10]))


def test_mp4_frame_slicer_rows(spark):
    mp4 = build_mp4(SAMPLES, chunks=[2, 2])
    frames = spark.createDataFrame(
        [(7, i, bytearray(mp4)) for i in range(6)],  # idx 4,5 past the trak
        "media_id long, frame_idx int, payload binary",
    )
    out = {
        (r.media_id, r.frame_idx): bytes(r.payload)
        for r in mp4_frame_slicer(frames, 0).collect()
    }
    assert out == {(7, i): SAMPLES[i] for i in range(4)}
    # frame_bytes caps each emitted sample
    capped = {
        r.frame_idx: bytes(r.payload)
        for r in mp4_frame_slicer(frames, 4).collect()
    }
    assert capped == {i: SAMPLES[i][:4] for i in range(4)}


def test_video_near_dup_with_real_demux(spark):
    """End-to-end through the frame_slicer= seam: two containers with
    identical samples (different box layout: one chunk vs split chunks)
    pair up; an unrelated container does not."""
    from matcha_spark.operators.multimodal import video_near_dup_pairs

    a = build_mp4(SAMPLES, chunks=[4])
    b = build_mp4(SAMPLES, chunks=[2, 2])  # same frames, other layout
    other = build_mp4([s[::-1] for s in SAMPLES], chunks=[4])
    media = spark.createDataFrame(
        [
            (1, "video", "mp4", None, None, 3000, bytearray(a)),
            (2, "video", "mp4", None, None, 3000, bytearray(b)),
            (3, "video", "mp4", None, None, 3000, bytearray(other)),
        ],
        "media_id long, kind string, format string, width int, height int,"
        " duration_ms long, payload binary",
    )
    pairs = {
        (r.vid_a, r.vid_b): r.shared_frames
        for r in video_near_dup_pairs(
            media,
            every_ms=1000,
            frame_bytes=0,
            max_hamming=0,
            min_shared_frames=2,
            frame_slicer=mp4_frame_slicer,
        ).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] >= 4
    assert not any(3 in p for p in pairs)


def test_write_mp4_roundtrip():
    """The product writer round-trips through the parser exactly —
    single-chunk and split-chunk layouts."""
    from matcha_spark.operators.demux import write_mp4

    for chunks in (None, [2, 1, 1], [1, 3]):
        mp4 = write_mp4(SAMPLES, chunks=chunks)
        ranges = parse_mp4_samples(mp4)
        assert [mp4[o : o + s] for o, s in ranges] == SAMPLES
    with pytest.raises(ValueError):
        write_mp4(SAMPLES, chunks=[1, 1])  # doesn't cover all samples


def test_wav_decode_variants():
    """Pure-struct RIFF/WAVE decoder: 16-bit round-trip, 8-bit unsigned,
    float32, stereo-to-mono averaging, extra chunks, and the
    compressed-format refusal."""
    import numpy as np

    from matcha_spark.operators.codecs import wav_decode_audio, write_wav

    w = (np.arange(-64, 64, dtype=np.float64)) / 128.0
    assert np.array_equal(wav_decode_audio(write_wav(w)), w)

    def riff(fmt_body: bytes, data: bytes, extra: bytes = b"") -> bytes:
        chunks = (
            b"WAVE"
            + extra
            + b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
            + b"data" + struct.pack("<I", len(data)) + data
        )
        return b"RIFF" + struct.pack("<I", len(chunks)) + chunks

    # 8-bit unsigned PCM
    fmt8 = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    out = wav_decode_audio(riff(fmt8, bytes([0, 128, 255])))
    assert np.allclose(out, [(0 - 128) / 128, 0.0, (255 - 128) / 128])
    # float32 (format 3), plus a junk chunk before fmt
    fmtf = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)
    vals = np.array([0.25, -0.5], dtype="<f4")
    junk = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"  # odd size: padded
    out = wav_decode_audio(riff(fmtf, vals.tobytes(), extra=junk))
    assert np.allclose(out, vals.astype(np.float64))
    # stereo 16-bit averages to mono
    fmt2 = struct.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16)
    pcm = np.array([8192, -8192, 16384, 0], dtype="<i2")  # L R L R
    out = wav_decode_audio(riff(fmt2, pcm.tobytes()))
    assert np.allclose(out, [0.0, 0.25])
    # compressed format refused with a pointer at the optional decoder
    fmtc = struct.pack("<HHIIHH", 85, 1, 8000, 8000, 1, 0)  # MP3-in-WAV
    with pytest.raises(ValueError, match="soundfile"):
        wav_decode_audio(riff(fmtc, b"\x00\x00"))
    with pytest.raises(ValueError):
        wav_decode_audio(b"RIFFxxxxNOPE")


def test_png_decode_roundtrip_and_filters():
    """Pure-struct PNG decoder: writer round-trip, independent
    forward-filter encodings of all five filter types inverted
    correctly, RGB-to-luma, and the refusal paths."""
    import zlib

    import numpy as np

    from matcha_spark.operators.codecs import png_decode_image, write_png

    g = (np.arange(64).reshape(8, 8) * 3) % 256
    assert np.array_equal(png_decode_image(write_png(g)), g.astype(np.float64))

    def chunk(ctype: bytes, data: bytes) -> bytes:
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)

    def encode(img, filters, channels=1, color_type=0):
        h, w = img.shape[0], img.shape[1]
        flat = img.reshape(h, w * channels).astype(np.int32)
        rows, prev = [], np.zeros(w * channels, np.int32)
        for y, ft in zip(range(h), filters):
            cur = flat[y]
            if ft == 0:
                enc = cur.copy()
            elif ft == 1:
                enc = cur.copy()
                enc[channels:] = (cur[channels:] - cur[:-channels]) & 255
            elif ft == 2:
                enc = (cur - prev) & 255
            elif ft == 3:
                enc = cur.copy()
                for i in range(w * channels):
                    a = cur[i - channels] if i >= channels else 0
                    enc[i] = (cur[i] - ((a + prev[i]) >> 1)) & 255
            else:
                enc = cur.copy()
                for i in range(w * channels):
                    a = cur[i - channels] if i >= channels else 0
                    b = prev[i]
                    c = prev[i - channels] if i >= channels else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                    enc[i] = (cur[i] - pred) & 255
            rows.append(bytes([ft]) + bytes(enc.astype(np.uint8)))
            prev = cur
        ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
        return (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(b"".join(rows)))
            + chunk(b"IEND", b"")
        )

    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (5, 7)).astype(np.uint8)
    out = png_decode_image(encode(img, [0, 1, 2, 3, 4]))
    assert np.array_equal(out, img.astype(np.float64))

    rgb = rng.randint(0, 256, (3, 4, 3)).astype(np.uint8)
    out = png_decode_image(encode(rgb, [4, 2, 1], channels=3, color_type=2))
    luma = 0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
    assert np.allclose(out, luma)

    with pytest.raises(ValueError):
        png_decode_image(b"not a png")
    interlaced = bytearray(write_png(g))
    # IHDR body starts at 16; interlace flag is its last byte
    interlaced[16 + 12] = 1
    with pytest.raises(ValueError, match="pillow"):
        png_decode_image(bytes(interlaced))


def test_sniff_decoders_route_and_refuse():
    """Magic-byte routers: PNG/WAV hit the library-free paths; unknown
    formats fail loudly (never the silent fake) when the optional
    libraries are absent."""
    import numpy as np

    from matcha_spark.operators import codecs as C

    g = np.arange(16).reshape(4, 4).astype(np.uint8)
    assert np.array_equal(C.sniff_decode_image(C.write_png(g)), g.astype(float))
    w = np.array([0.25, -0.5, 0.0])
    assert np.allclose(
        C.sniff_decode_audio(C.write_wav(w)), np.round(w * 32768) / 32768
    )
    if not C.available()["pillow"]:
        with pytest.raises((ValueError, ImportError)):
            C.sniff_decode_image(b"\xff\xd8\xff\xe0 jpeg-ish")
    if not C.available()["soundfile"]:
        with pytest.raises((ValueError, ImportError)):
            C.sniff_decode_audio(b"fLaC....")


def test_parse_mp4_hostile_inputs():
    """r10 review findings: a zero-based stsc first_chunk must raise
    (not wrap to the last chunk's offset), a fixed-size stsz claiming
    more bytes than the payload must raise before allocating, and a
    zero-sample container parses to []."""
    import numpy as np

    from matcha_spark.operators.demux import parse_mp4_samples, write_mp4

    good = write_mp4(SAMPLES, chunks=[2, 2])

    # corrupt the stsc first_chunk of the first entry to 0
    k = good.find(b"stsc")
    bad = bytearray(good)
    # FullBox(4) + entry_count(4) then first_chunk(4)
    bad[k + 4 + 4 + 4 : k + 4 + 4 + 8] = struct.pack(">I", 0)
    with pytest.raises(ValueError, match="first_chunk"):
        parse_mp4_samples(bytes(bad))

    # fixed-size stsz with a hostile sample_count
    hostile = build_mp4([b"12345678"] * 2, fixed_size=8)
    k = hostile.find(b"stsz")
    bad = bytearray(hostile)
    bad[k + 4 + 8 : k + 4 + 12] = struct.pack(">I", 0xFFFFFFFF)
    with pytest.raises(ValueError, match="more sample bytes"):
        parse_mp4_samples(bytes(bad))

    # empty trak round-trips to zero samples
    assert parse_mp4_samples(write_mp4([])) == []


def test_doc_video_pipeline_planted(spark):
    """r11 zero-seam pipeline entry: planted copies (and only they)
    pair with their originals, exactly the >= 2-frame population."""
    from matcha_spark.suite import doc_video_pipeline, load_tables

    sf = "/root/testdata/sf0.001"
    got = {(r.vid_a, r.vid_b) for r in doc_video_pipeline(spark, sf).collect()}
    docs = load_tables(spark, sf, "documents")["documents"].collect()
    want = {
        (r.doc_id, r.doc_id + 1_000_000)
        for r in docs
        if r.doc_id % 10 == 0 and len((r.text or "").encode()) >= 129
    }
    assert got == want and got


# ---------------------------------------------------------------------------
# r11: baseline JPEG codec
# ---------------------------------------------------------------------------


def test_jpeg_roundtrip_greyscale():
    """Encoder/decoder round-trip: shape preserved, error bounded by
    quantization (tight on smooth content, bounded on noise)."""
    import numpy as np

    from matcha_spark.operators.codecs import jpeg_decode_image, write_jpeg

    rng = np.random.default_rng(11)
    for shape in [(8, 8), (16, 24), (17, 9), (64, 40)]:
        a = rng.integers(0, 256, shape).astype(float)
        out = jpeg_decode_image(write_jpeg(a, quality=95))
        assert out.shape == shape
        assert np.abs(out - a).max() <= 16  # noise: bounded by quant
    # smooth gradient: near-exact at high quality
    y, x = np.mgrid[0:32, 0:32]
    g = (y * 4 + x * 2).astype(float) % 256
    out = jpeg_decode_image(write_jpeg(g, quality=95))
    assert np.abs(out - g).mean() < 3


def test_jpeg_color_luma_and_restarts():
    """The YCbCr path decodes the same luma as greyscale (neutral
    chroma blocks advance the entropy stream but skip the IDCT), and
    restart intervals change the byte stream, not the pixels."""
    import numpy as np

    from matcha_spark.operators.codecs import jpeg_decode_image, write_jpeg

    rng = np.random.default_rng(12)
    a = rng.integers(0, 256, (24, 40)).astype(float)
    base = jpeg_decode_image(write_jpeg(a, quality=90))
    for ri in (1, 2, 7):
        assert np.allclose(
            jpeg_decode_image(write_jpeg(a, quality=90, restart_every=ri)), base
        )
        assert np.allclose(
            jpeg_decode_image(
                write_jpeg(a, quality=90, color=True, restart_every=ri)
            ),
            base,
        )
    # determinism: identical input -> identical container bytes
    assert write_jpeg(a, 90, True, 3) == write_jpeg(a, 90, True, 3)


def test_jpeg_error_paths_and_sniff():
    import numpy as np
    import pytest

    from matcha_spark.operators.codecs import (
        jpeg_decode_image,
        sniff_decode_image,
        write_jpeg,
    )

    with pytest.raises(ValueError, match="SOI"):
        jpeg_decode_image(b"not a jpeg")
    # a progressive frame marker (SOF2) must raise, not mis-decode
    a = np.zeros((8, 8))
    buf = bytearray(write_jpeg(a))
    i = buf.find(b"\xFF\xC0")
    buf[i + 1] = 0xC2
    with pytest.raises(ValueError, match="non-baseline"):
        jpeg_decode_image(bytes(buf))
    # magic-byte routing reaches the struct decoder
    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, (16, 16)).astype(float)
    out = sniff_decode_image(write_jpeg(img, quality=95))
    assert out.shape == (16, 16)


def test_jpeg_in_mp4_video_pipeline():
    """MJPEG-style composition: JPEG samples inside a real MP4 demux
    through the same seams the PNG pipeline uses — identical containers
    produce identical pHashes."""
    import numpy as np

    from matcha_spark.operators.codecs import sniff_decode_image, write_jpeg
    from matcha_spark.operators.demux import parse_mp4_samples, write_mp4

    rng = np.random.default_rng(14)
    frames = [
        write_jpeg(rng.integers(0, 256, (8, 8)).astype(float)) for _ in range(4)
    ]
    container = write_mp4(frames, chunks=[2, 2])
    samples = parse_mp4_samples(container)
    assert len(samples) == 4
    for (off, size), f in zip(samples, frames):
        assert container[off : off + size] == f
        assert sniff_decode_image(container[off : off + size]).shape == (8, 8)


def test_doc_video_mjpeg_matches_png_pipeline(spark):
    """The MJPEG and PNG zero-seam pipelines must find the identical
    planted-pair set — the codec changes, the dedup semantics do not."""
    from matcha_spark.suite import doc_video_mjpeg, doc_video_pipeline

    sf = "/root/testdata/sf0.001"
    a = sorted((r.vid_a, r.vid_b) for r in doc_video_mjpeg(spark, sf).collect())
    b = sorted(
        (r.vid_a, r.vid_b) for r in doc_video_pipeline(spark, sf).collect()
    )
    assert a == b and a


def test_jpeg_truncation_fuzz():
    """Every prefix truncation and random single-byte corruption of a
    valid stream terminates promptly with ValueError (or decodes, for
    cuts past the scan data) — never a raw IndexError/KeyError or a
    hang (fuzz finding: short reads inside the scan surfaced as list
    index faults before the wrapper)."""
    import numpy as np

    from matcha_spark.operators.codecs import jpeg_decode_image, write_jpeg

    rng = np.random.default_rng(77)
    buf = write_jpeg(
        rng.integers(0, 256, (16, 24)).astype(float), color=True,
        restart_every=2,
    )
    for cut in range(len(buf)):
        try:
            jpeg_decode_image(buf[:cut])
        except ValueError:
            pass
    for _ in range(200):
        b = bytearray(buf)
        b[int(rng.integers(0, len(b)))] = int(rng.integers(0, 256))
        try:
            jpeg_decode_image(bytes(b))
        except ValueError:
            pass


def test_media_family_string_ids(spark):
    """media_id is id-type-agnostic across the media kernels (uuid-keyed
    asset stores): features, pHash (+ banded pairs), audio fingerprint,
    and the MP4 frame slicer all adopt a string id type."""
    import numpy as np

    from matcha_spark.operators.multimodal import (
        audio_fingerprint,
        image_features,
        image_phash,
        phash_near_dup_pairs,
    )

    blob = bytes(range(64)) * 4
    media = spark.createDataFrame(
        [
            ("m-a", "image", 8, 8, None, bytearray(blob)),
            ("m-b", "image", 8, 8, None, bytearray(blob)),  # identical
            ("m-c", "image", 8, 8, None, bytearray(blob[::-1])),
            ("m-d", "audio", None, None, 1000, bytearray(bytes(range(256)) * 8)),
        ],
        "media_id string, kind string, width int, height int, "
        "duration_ms long, payload binary",
    )
    feats = image_features(media)
    assert feats.schema["media_id"].dataType.simpleString() == "string"
    assert {r.media_id for r in feats.collect()} == {"m-a", "m-b", "m-c"}

    ph = image_phash(media)
    assert ph.schema["media_id"].dataType.simpleString() == "string"
    pairs = {(r.id_a, r.id_b) for r in phash_near_dup_pairs(
        media, max_hamming=0).collect()}
    assert ("m-a", "m-b") in pairs

    def raw_decode(payload: bytes) -> np.ndarray:
        return (np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
                / 128.0 - 1.0)

    fp = audio_fingerprint(media, decoder=raw_decode)
    assert fp.schema["media_id"].dataType.simpleString() == "string"
    assert {r.media_id for r in fp.collect()} == {"m-d"}

    mp4 = build_mp4(SAMPLES, chunks=[2, 2])
    frames = spark.createDataFrame(
        [("vid-1", i, bytearray(mp4)) for i in range(4)],
        "media_id string, frame_idx int, payload binary",
    )
    sliced = {
        (r.media_id, r.frame_idx): bytes(r.payload)
        for r in mp4_frame_slicer(frames, 0).collect()
    }
    assert sliced == {("vid-1", i): SAMPLES[i] for i in range(4)}


def test_flac_roundtrip_and_subset_policy():
    """Pure-struct FLAC (r12): lossless round-trip through genuine
    fLaC framing (multi-frame via small blocks, short final block,
    CONSTANT and VERBATIM subframes), empty stream, CRC validation,
    and the sniff router."""
    import numpy as np

    from matcha_spark.operators.codecs import (
        flac_decode_audio,
        sniff_decode_audio,
        write_flac,
    )

    # multi-frame with a short tail; values k/32768 round-trip exactly
    w = (np.arange(-300, 301, dtype=np.float64) * 17 % 32768 - 16384) / 32768.0
    got = flac_decode_audio(write_flac(w, block_size=64))
    assert np.array_equal(got, np.round(w * 32768) / 32768.0)

    # constant blocks take the CONSTANT subframe path
    flat = np.full(500, 5 / 32768.0)
    enc = write_flac(flat, block_size=128)
    assert np.array_equal(flac_decode_audio(enc), flat)
    # CONSTANT frames are tiny: 500 samples ≪ 500 * 2 bytes
    assert len(enc) < 200

    # empty stream: metadata only, zero frames
    assert len(flac_decode_audio(write_flac(np.array([])))) == 0

    # corruption anywhere in a frame fails a CRC, never returns garbage
    enc = bytearray(write_flac((np.arange(50) - 25) / 32768.0, block_size=16))
    enc[60] ^= 0xFF
    try:
        flac_decode_audio(bytes(enc))
        raise AssertionError("corrupt frame decoded")
    except ValueError as e:
        assert "CRC" in str(e)

    # magic-byte routing picks the pure-struct path
    assert np.array_equal(
        sniff_decode_audio(write_flac(flat, block_size=128)), flat
    )

    # not-a-flac refusal
    try:
        flac_decode_audio(b"junk")
        raise AssertionError("junk decoded")
    except ValueError as e:
        assert "fLaC" in str(e)


def test_flac_decoder_untrusted_bytes_fuzz():
    """The FLAC decoder sees corpus payloads, i.e. untrusted bytes:
    whatever the input, it must either return a waveform or raise
    ValueError — never crash with an internal exception, hang, or
    return garbage past a failed CRC.  Garbage, truncations at every
    boundary class, bit-flips, and hypothesis-driven random buffers."""
    import random

    import numpy as np

    from matcha_spark.operators.codecs import flac_decode_audio, write_flac

    rng = random.Random(99)
    real = write_flac(
        (np.arange(-200, 200, dtype=np.float64) * 31 % 32768 - 16384)
        / 32768.0,
        block_size=32,
    )

    def probe(buf):
        try:
            out = flac_decode_audio(buf)
            assert isinstance(out, np.ndarray)
        except ValueError:
            pass  # the contract: ValueError or a valid waveform

    probe(b"")
    probe(b"fLaC")
    probe(b"fLaC" + bytes(rng.randrange(256) for _ in range(64)))
    probe(bytes(rng.randrange(256) for _ in range(512)))
    for i in range(0, len(real), max(1, len(real) // 50)):
        probe(real[:i])
    for _ in range(60):
        b = bytearray(real)
        for _ in range(3):
            b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
        probe(bytes(b))


def test_flac_roundtrip_hypothesis():
    """Property: any float waveform round-trips through write_flac →
    flac_decode_audio to its int16 quantization, at any spec-legal
    block size (≥ 16 — r12 advice: STREAMINFO forbids smaller; final
    short frames are covered by sizes not dividing the length)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st
    import numpy as np
    import pytest

    from matcha_spark.operators.codecs import flac_decode_audio, write_flac

    with pytest.raises(ValueError, match="block_size"):
        write_flac(np.zeros(4), block_size=3)

    @settings(max_examples=40, deadline=None)
    @given(
        st.lists(
            st.floats(min_value=-1.0, max_value=0.999, allow_nan=False),
            min_size=0,
            max_size=400,
        ),
        st.sampled_from([16, 17, 33, 64, 4096]),
    )
    def run(vals, bs):
        w = np.array(vals, dtype=np.float64)
        got = flac_decode_audio(write_flac(w, block_size=bs))
        want = np.clip(np.round(w * 32768.0), -32768, 32767) / 32768.0
        assert np.array_equal(got, want)

    run()
