"""Pure-Python codec round-trips + the Arrow decode pipeline.

The encode side exists to synthesize fixtures; the DECODE side is the
operator under test — real header parsing, stride-padded rasters, RIFF
chunk walks. Malformed/unknown containers must fall back to the
deterministic stub instead of killing the batch.
"""

from __future__ import annotations

import struct

from lol_data_collection_system_spark.operators import multimodal as mm

# ---------------------------------------------------------------------------
# BMP
# ---------------------------------------------------------------------------
def test_bmp_roundtrip_gradient():
    w, h = 3, 2
    pixels = [(10 + x + y, 77, 200) for y in range(h) for x in range(w)]
    payload = mm.encode_bmp(w, h, pixels)
    stride = (w * 3 + 3) // 4 * 4
    assert len(payload) == 54 + h * stride
    gw, gh, mr, mg, mb = mm.decode_bmp(payload)
    assert (gw, gh) == (w, h)
    # mean of 10+x+y over the 3x2 grid: 10 + (0+1+2)/3 + (0+1)/2 = 11.5
    assert mr == 11.5 and mg == 77.0 and mb == 200.0


def test_bmp_stride_padding_not_counted_as_pixels():
    # w=1 -> 3 data bytes + 1 pad byte per row; a stride-unaware reader
    # would fold pad bytes into the next pixel
    payload = mm.encode_bmp(1, 4, [(50, 60, 70)] * 4)
    _, _, mr, mg, mb = mm.decode_bmp(payload)
    assert (mr, mg, mb) == (50.0, 60.0, 70.0)


# ---------------------------------------------------------------------------
# WAV
# ---------------------------------------------------------------------------
def test_wav_roundtrip_alternating():
    payload = mm.encode_wav(16_000, [300, -300, 300])
    assert len(payload) == 44 + 6
    sr, n, amp = mm.decode_wav(payload)
    assert (sr, n, amp) == (16_000, 3, 300.0)


def test_wav_chunk_walk_skips_extra_chunks():
    base = mm.encode_wav(8_000, [100, -100])
    # splice a LIST chunk between fmt and data
    head, tail = base[:36], base[36:]
    extra = struct.pack("<4sI", b"LIST", 4) + b"INFO"
    payload = head[:12] + head[12:36] + extra + tail
    sr, n, amp = mm.decode_wav(payload)
    assert (sr, n, amp) == (8_000, 2, 100.0)


# ---------------------------------------------------------------------------
# PPM frame stack
# ---------------------------------------------------------------------------
def test_ppm_frames_roundtrip():
    payload = mm.encode_ppm_frames(2, 2, [(9, 0, 0), (11, 0, 0)])
    nf, w, h, mr = mm.decode_ppm_frames(payload)
    assert (nf, w, h, mr) == (2, 2, 2, 10.0)


# ---------------------------------------------------------------------------
# Dispatch + stub fallback
# ---------------------------------------------------------------------------
def test_decode_payload_dispatches_on_magic():
    img = mm._decode_payload(mm.encode_bmp(2, 1, [(4, 5, 6), (6, 5, 6)]), "image")
    assert img == [2.0, 1.0, 5.0, 5.0, 6.0]
    wav = mm._decode_payload(mm.encode_wav(16_000, [7]), "audio")
    assert wav == [16_000.0, 1.0, 7.0, 0.0, 0.0]
    vid = mm._decode_payload(mm.encode_ppm_frames(2, 2, [(3, 0, 0)]), "video")
    assert vid == [1.0, 2.0, 2.0, 3.0, 0.0]


def test_decode_payload_unknown_and_malformed_fall_back_to_stub():
    for payload in (b"\xff\xd8\xffJPEGish", b"BMtruncated", b"RIFFxxxxWAVE"):
        out = mm._decode_payload(payload, "image")
        assert len(out) == mm.N_FEATURES
        assert all(0.0 <= v < 1.0 for v in out[:4]) and out[4] == 0.0
        assert out == mm._decode_payload(payload, "image")  # deterministic


# ---------------------------------------------------------------------------
# Distributed pipeline end-to-end
# ---------------------------------------------------------------------------
def test_decode_features_real_bytes_distributed(spark):
    docs = spark.createDataFrame(
        [(i, 40 + i) for i in range(12)], ["doc_id", "n_chars"]
    )
    media = mm.media_from_documents(docs.repartition(4))
    got = {r.media_id: r for r in mm.decode_features(media).collect()}
    assert len(got) == 12
    for i in range(12):
        r = got[i]
        expect_mod = ["image", "audio", "video"][i % 3]
        assert r.modality == expect_mod
        if expect_mod == "image":
            w, h = i % 7 + 1, i % 5 + 1
            assert r.feature[0] == w and r.feature[1] == h
            assert r.feature[2] == i % 200 + (w - 1) / 2 + (h - 1) / 2
        elif expect_mod == "audio":
            assert r.feature[:3] == [16_000.0, float(i % 32 + 1), float(i % 1000)]
        else:
            assert r.feature[0] == float(i % 300 + 1)
            assert r.feature[3] == float(i % 256)
        assert r.n_bytes == len(
            mm.synth_media_row(i, 40 + i)[1]
        )


def test_resize_nearest_downsample_known_pixels():
    # 4x2 image with distinct pixels; 2x2 NN picks (x*4//2, y*2//2) =
    # (0,0), (2,0), (0,1), (2,1)
    px = [(10 * x + y, 0, 0) for y in range(2) for x in range(4)]
    payload = mm.encode_bmp(4, 2, px)
    out = mm.resize_bmp_nearest(payload, 2, 2)
    w, h, got = mm.decode_bmp_pixels(out)
    assert (w, h) == (2, 2)
    assert [p[0] for p in got] == [0, 20, 1, 21]


def test_resize_nearest_upsample_replicates():
    payload = mm.encode_bmp(1, 1, [(7, 8, 9)])
    out = mm.resize_bmp_nearest(payload, 3, 2)
    w, h, got = mm.decode_bmp_pixels(out)
    assert (w, h) == (3, 2) and set(got) == {(7, 8, 9)}


def test_resize_images_roundtrip_stats(spark):
    docs = spark.createDataFrame(
        [(i, 100 + i) for i in range(0, 12, 3)], "doc_id long, n_chars long"
    )
    media = mm.media_from_documents(docs).filter("modality = 'image'")
    rows = {r.media_id: r for r in mm.resize_images(media, 2, 2).collect()}
    for i in rows:
        w, h = i % 7 + 1, i % 5 + 1
        r = rows[i]
        assert (r.width_in, r.height_in, r.width_out, r.height_out) == (w, h, 2, 2)
        assert r.mean_r == i % 200 + (w // 2) / 2 + (h // 2) / 2
        assert r.mean_g == (100 + i) % 256


def test_truncated_ppm_header_raises_not_hangs():
    import pytest as _pytest

    for bad in (b"P6", b"P6 1 2 255", b"P6abc", b"P6\n1 2\n"):
        with _pytest.raises(ValueError):
            mm.decode_ppm_frames(bad)
    # and the dispatcher falls back to the stub instead of dying
    out = mm._decode_payload(b"P6 1 2 255", "video")
    assert len(out) == mm.N_FEATURES and all(0 <= v < 1 or v == 0.0 for v in out)


def test_zero_area_bmp_falls_back_to_stub():
    import struct as _struct

    payload = bytearray(mm.encode_bmp(1, 1, [(1, 2, 3)]))
    _struct.pack_into("<i", payload, 18, 0)  # width = 0
    out = mm._decode_payload(bytes(payload), "image")
    assert len(out) == mm.N_FEATURES  # stub, not ZeroDivisionError


def test_top_down_bmp_decodes_without_flip():
    import struct as _struct

    px = [(10, 0, 0), (20, 0, 0), (30, 0, 0), (40, 0, 0)]  # 2x2 top-down
    bottom_up = mm.encode_bmp(2, 2, px)
    w, h, got = mm.decode_bmp_pixels(bottom_up)
    assert got == px
    # craft the top-down variant: negative height, rows in file order
    data_off = _struct.unpack_from("<I", bottom_up, 10)[0]
    stride = (2 * 3 + 3) // 4 * 4
    body = bottom_up[data_off:]
    rows = [body[i * stride : (i + 1) * stride] for i in range(2)]
    top_down = bytearray(bottom_up[:data_off] + rows[1] + rows[0])
    _struct.pack_into("<i", top_down, 22, -2)  # biHeight = -2
    w, h, got2 = mm.decode_bmp_pixels(bytes(top_down))
    assert (w, h) == (2, 2) and got2 == px


# ---------------------------------------------------------------------------
# dHash perceptual fingerprint + Hamming-banded near-dup grouping
# ---------------------------------------------------------------------------
def _checker(w, h, base=40, step=90):
    """A non-monotone test image (checkerboard-ish) so mirroring and
    editing actually move dHash bits."""
    return [
        (base + step * ((x * 3 + y * 7) % 2), 10, 20)
        for y in range(h)
        for x in range(w)
    ]


def test_dhash_brightness_shift_invariant():
    w, h = 12, 10
    px = _checker(w, h)
    shifted = [(r + 30, g + 30, b + 30) for r, g, b in px]
    assert mm.dhash64(mm.encode_bmp(w, h, px)) == mm.dhash64(
        mm.encode_bmp(w, h, shifted)
    )
    # and the hash is non-degenerate: some bits set, some clear
    hv = mm.dhash64(mm.encode_bmp(w, h, px))
    assert 0 < hv < (1 << 64) - 1


def test_dhash_mirror_canonicalization():
    w, h = 12, 10
    px = _checker(w, h)
    flipped = mm.mirror_pixels(w, px)
    a, b = mm.encode_bmp(w, h, px), mm.encode_bmp(w, h, flipped)
    # plain dHash is orientation-sensitive ...
    assert mm.dhash64(a) != mm.dhash64(b)
    # ... but the canonical min(hash, mirrored hash) collides
    assert min(mm.dhash64(a), mm.dhash64(a, mirror=True)) == min(
        mm.dhash64(b), mm.dhash64(b, mirror=True)
    )


def test_hamming_components_groups_near_and_splits_far(spark):
    from lol_data_collection_system_spark.operators.dedup import (
        hamming_components,
    )

    h1 = 0x0F0F0F0F0F0F0F0F
    h2 = h1 ^ 0b111  # 3 bits away: near-dup of h1
    # 11 bits away incl. the sign bit: far, and exercises signed storage
    h3 = mm._signed64(h1 ^ ((1 << 63) | (1 << 40) | (1 << 20) | 0xFF))
    sigs = spark.createDataFrame(
        [(1, h1), (2, h2), (3, h1), (4, h3)], ["media_id", "phash"]
    ).select("media_id", "phash")
    got = {
        r.media_id: r.component_id
        for r in hamming_components(sigs, threshold=6).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 4}


def test_hamming_components_rejects_lossy_threshold(spark):
    import pytest as _pytest

    from lol_data_collection_system_spark.operators.dedup import (
        hamming_components,
    )

    sigs = spark.createDataFrame([(1, 0)], ["media_id", "phash"])
    with _pytest.raises(ValueError, match="recall"):
        hamming_components(sigs, threshold=8, n_bands=8)


def test_hamming_rejects_bits_word_mismatch(spark):
    """bits must equal 64 × the word-column count: JVM shifts wrap mod
    64, so bits=128 over ONE 64-bit column would alias band offsets
    64..112 onto 0..48 and silently break recall-1 exactness (ADVICE
    r7) — it must raise instead."""
    import pytest as _pytest

    from lol_data_collection_system_spark.operators.dedup import (
        hamming_candidate_edges,
    )

    one_word = spark.createDataFrame([(1, 7)], ["media_id", "phash"])
    with _pytest.raises(ValueError, match="wrap"):
        hamming_candidate_edges(
            one_word, "media_id", "phash", threshold=6, n_bands=8, bits=128
        )
    two_words = spark.createDataFrame([(1, 7, 9)], ["media_id", "h0", "h1"])
    with _pytest.raises(ValueError, match="wrap"):
        hamming_candidate_edges(
            two_words, "media_id", ["h0", "h1"],
            threshold=6, n_bands=8, bits=64,
        )


def test_hamming_pair_budget_guard(spark):
    """The banded self-join refuses loudly when Σ|bucket|C2 exceeds the
    declared budget (bucket space is only 2^band_width per band — the
    SCALING.md round-7 ceiling), and runs when the budget allows."""
    import pytest as _pytest

    from lol_data_collection_system_spark.operators.dedup import (
        PairBudgetExceeded,
        hamming_candidate_edges,
    )

    # 40 hashes agreeing on band 0 (low byte) -> that band alone carries
    # 40C2 = 780 candidate pairs
    sigs = spark.createDataFrame(
        [(i, (i << 8) | 0x55) for i in range(40)], ["media_id", "phash"]
    )
    with _pytest.raises(PairBudgetExceeded, match="pair_budget"):
        hamming_candidate_edges(
            sigs, "media_id", "phash", pair_budget=100
        )
    ok = hamming_candidate_edges(
        sigs, "media_id", "phash", pair_budget=10_000
    )
    assert ok.count() >= 0  # within budget: the join runs


def test_hamming_banding_exact_vs_bruteforce_narrow_bands(spark):
    """The pigeonhole guard is on the band COUNT, not the band width:
    n_bands=16 (4-bit bands) with threshold up to 15 is still exact.
    Pin recall 1 by comparing banded candidate edges against a Python
    brute-force over hashes engineered to spread their differing bits
    one-per-band (the case a width-based guard would wrongly allow to
    be missed — or wrongly reject as lossy)."""
    from lol_data_collection_system_spark.operators.dedup import (
        hamming_candidate_edges,
    )

    base = 0x123456789ABCDEF0
    hashes = [base]
    # flip one bit in each of k distinct 4-bit bands, k = 1..10:
    # pairwise distances range over 1..10 with diffs spread across bands
    for k in range(1, 11):
        h = base
        for band in range(k):
            h ^= 1 << (band * 4)
        hashes.append(h)
    sigs = [(i + 1, mm._signed64(h)) for i, h in enumerate(hashes)]
    df = spark.createDataFrame(sigs, ["media_id", "phash"])
    got = {
        (r.id_a, r.id_b)
        for r in hamming_candidate_edges(
            df, "media_id", "phash", threshold=10, n_bands=16
        ).collect()
    }
    want = {
        (a + 1, b + 1)
        for a in range(len(hashes))
        for b in range(a + 1, len(hashes))
        if bin(hashes[a] ^ hashes[b]).count("1") <= 10
    }
    assert got == want and len(want) > 0


def test_hamming_multiword_exact_vs_bruteforce(spark):
    """128-bit fingerprints as (hi, lo) word pairs: banded candidates
    at bits=128/n_bands=8 (16-bit bands) must equal a Python brute
    force over the concatenated hash — including pairs whose differing
    bits straddle the word boundary."""
    from lol_data_collection_system_spark.operators.dedup import (
        hamming_candidate_edges,
    )

    base = (0xDEADBEEFCAFEF00D << 64) | 0x0123456789ABCDEF
    hashes = [base]
    # k flips spread across the full 128-bit width (both words)
    for k in range(1, 8):
        h = base
        for j in range(k):
            h ^= 1 << (j * 17)  # positions 0,17,...,119 cross both words
        hashes.append(h)

    def words(h):
        return (mm._signed64(h >> 64), mm._signed64(h & ((1 << 64) - 1)))

    df = spark.createDataFrame(
        [(i + 1, *words(h)) for i, h in enumerate(hashes)],
        ["media_id", "phash_hi", "phash_lo"],
    )
    got = {
        (r.id_a, r.id_b)
        for r in hamming_candidate_edges(
            df, "media_id", ["phash_hi", "phash_lo"],
            threshold=6, n_bands=8, bits=128,
        ).collect()
    }
    want = {
        (a + 1, b + 1)
        for a in range(len(hashes))
        for b in range(a + 1, len(hashes))
        if bin(hashes[a] ^ hashes[b]).count("1") <= 6
    }
    assert got == want and len(want) > 0


def test_phash_wide_components_match_width_groups(spark):
    """The 128-bit wide path groups the gradient fixture exactly like
    the 64-bit path: components == width groups (same closed form —
    distinct widths differ in ≥ 8 of the 128 bits, same-width images
    hash identically)."""
    from pyspark.sql import functions as F2

    from lol_data_collection_system_spark.operators.dedup import (
        hamming_components,
    )

    rows = []
    for d in range(0, 60, 3):  # image doc_ids
        _, payload, _ = mm.synth_media_row(d, 100 + d)
        rows.append((d, "image", payload, None))
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    comp = {
        r.media_id: r.component_id
        for r in hamming_components(
            mm.phash_images_wide(media),
            hash_col=["phash_hi", "phash_lo"],
            threshold=6, n_bands=8, bits=128,
        ).collect()
    }
    want = {}
    for d in range(0, 60, 3):
        grp = d % 7
        want[d] = min(x for x in range(0, 60, 3) if x % 7 == grp)
    assert comp == want


def test_phash_images_flip_and_brightness_grouping(spark):
    """End-to-end: a brightness-shifted copy and (with include_mirror) a
    horizontally flipped copy land in the original's component; an
    unrelated image does not."""
    from pyspark.sql import types as T2

    from lol_data_collection_system_spark.operators.dedup import (
        hamming_components,
    )

    w, h = 12, 10
    px = _checker(w, h)
    rows = [
        (1, "image", mm.encode_bmp(w, h, px), None),
        (2, "image",
         mm.encode_bmp(w, h, [(r + 25, g + 25, b + 25) for r, g, b in px]),
         None),
        (3, "image", mm.encode_bmp(w, h, mm.mirror_pixels(w, px)), None),
        # a different spatial PATTERN (dHash keys on difference signs,
        # so only structure — not base/step levels — separates images)
        (4, "image",
         mm.encode_bmp(
             w, h,
             [(10 + 13 * ((x // 2 + y) % 2), 10, 20)
              for y in range(h) for x in range(w)],
         ),
         None),
    ]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    comp = {
        r.media_id: r.component_id
        for r in hamming_components(
            mm.phash_images(media, include_mirror=True), threshold=6
        ).collect()
    }
    assert comp[1] == comp[2] == comp[3] == 1  # brightness + flip grouped
    assert comp[4] != 1  # different texture stays apart


def test_ahash64_gain_invariance_and_twin(spark):
    """Waveform dHash: positive gain scaling never changes the hash; a
    python tap-comparison twin reproduces it bit for bit; silence and
    constant waveforms hash to 0."""
    from lol_data_collection_system_spark.operators import multimodal as mm

    quiet = [3, -1, 4, 1, -5, 9, -2, 6]
    loud = [s * 100 for s in quiet]
    h1 = mm.ahash64(mm.encode_wav(16000, quiet))
    h2 = mm.ahash64(mm.encode_wav(16000, loud))
    assert h1 == h2 != 0

    n = len(quiet)
    taps = [quiet[i * n // mm.AHASH_TAPS] for i in range(mm.AHASH_TAPS)]
    bits = sum(
        1 << i for i in range(mm.AHASH_TAPS - 1) if taps[i + 1] > taps[i]
    )
    assert h1 == mm._signed64(bits)

    assert mm.ahash64(mm.encode_wav(16000, [0] * 10)) == 0
    assert mm.ahash64(mm.encode_wav(16000, [7] * 10)) == 0


def test_ahash_audio_components_group_reuploads(spark):
    """A gain-scaled re-upload lands in the original's component; a
    different waveform keeps its own."""
    from pyspark.sql import types as T2

    from lol_data_collection_system_spark.operators import multimodal as mm
    from lol_data_collection_system_spark.operators.dedup import (
        hamming_components,
    )

    wave_a = [3, -1, 4, 1, -5, 9, -2, 6, -3, 8]
    wave_b = [1, 2, 3, 4, 5, 4, 3, 2, 1, 0]
    rows = [
        (1, bytearray(mm.encode_wav(16000, wave_a))),
        (2, bytearray(mm.encode_wav(16000, [s * 50 for s in wave_a]))),
        (3, bytearray(mm.encode_wav(16000, wave_b))),
    ]
    media = spark.createDataFrame(
        rows,
        T2.StructType([
            T2.StructField("media_id", T2.LongType()),
            T2.StructField("payload", T2.BinaryType()),
        ]),
    )
    sigs = mm.ahash_audio(media)
    comp = {
        r.media_id: r.component_id
        for r in hamming_components(
            sigs, "media_id", "ahash", threshold=3
        ).collect()
    }
    assert comp[1] == comp[2] == 1
    assert comp[3] != comp[1]


# ---------------------------------------------------------------------------
# PNG (round 10): zlib IHDR/IDAT walk, all five filter reconstructions
# ---------------------------------------------------------------------------
def test_png_roundtrip_every_filter_type():
    """Each of the five PNG filter types (None/Sub/Up/Average/Paeth)
    must reconstruct the exact pixels — per-filter and mixed per-row."""
    w, h = 5, 6
    pixels = [
        ((13 * x + 7 * y) % 256, (31 * x) % 256, (91 + y) % 256)
        for y in range(h)
        for x in range(w)
    ]
    for ft in range(5):
        payload = mm.encode_png(w, h, pixels, row_filter=lambda y: ft)
        gw, gh, px = mm.decode_png_pixels(payload)
        assert (gw, gh) == (w, h) and px == pixels, f"filter {ft}"
    mixed = mm.encode_png(w, h, pixels, row_filter=lambda y: y % 5)
    gw, gh, px = mm.decode_png_pixels(mixed)
    assert (gw, gh) == (w, h) and px == pixels
    gw, gh, mr, mg, mb = mm.decode_png(mixed)
    n = w * h
    assert mr == sum(p[0] for p in pixels) / n
    assert mb == sum(p[2] for p in pixels) / n


def test_png_dhash_parity_with_bmp():
    """Pixel-identical images fingerprint identically regardless of
    container — BOTH dHash widths, mirrored included — so the PNG path
    joins the perceptual near-dup family with no recalibration."""
    w, h = 7, 4
    pixels = [(40 + x + y, 9, 250) for y in range(h) for x in range(w)]
    bmp = mm.encode_bmp(w, h, pixels)
    png = mm.encode_png(w, h, pixels, row_filter=lambda y: (y + 2) % 5)
    assert mm.dhash64(png) == mm.dhash64(bmp)
    assert mm.dhash64(png, mirror=True) == mm.dhash64(bmp, mirror=True)
    assert mm.dhash128(png) == mm.dhash128(bmp)


def test_png_corruption_is_loud_then_stubbed():
    """A flipped byte breaks the chunk CRC: decode raises, and the
    mapInPandas dispatch falls back to the md5 stub (floats in [0, 1))
    instead of yielding silently wrong pixels."""
    import pytest as _pytest

    w, h = 3, 3
    pixels = [(x * 20, y * 20, 5) for y in range(h) for x in range(w)]
    good = mm.encode_png(w, h, pixels)
    assert mm._decode_payload(good, "image")[0] == float(w)  # real decode
    bad = bytearray(good)
    bad[40] ^= 0xFF  # inside IDAT -> CRC mismatch
    with _pytest.raises(ValueError, match="CRC"):
        mm.decode_png_pixels(bytes(bad))
    feats = mm._decode_payload(bytes(bad), "image")
    assert all(0.0 <= f < 1.0 for f in feats)  # documented stub shape


def test_png_media_adapter_matches_bmp_fixture_pixels(spark):
    """`png_media_from_documents` re-encodes the image cohort pixel-
    identically (cycling filters), so decode_features over it reports
    the same width/height/channel means as the BMP fixture."""
    docs = spark.createDataFrame(
        [(i, 100 + i) for i in range(0, 30, 3)], "doc_id long, n_chars long"
    )
    png_feats = {
        r["media_id"]: (r["f0"], r["f1"], r["f2"], r["f3"], r["f4"])
        for r in mm.decode_features(mm.png_media_from_documents(docs))
        .selectExpr(
            "media_id",
            *[f"feature[{i}] AS f{i}" for i in range(mm.N_FEATURES)],
        )
        .collect()
    }
    bmp_feats = {
        r["media_id"]: (r["f0"], r["f1"], r["f2"], r["f3"], r["f4"])
        for r in mm.decode_features(
            mm.media_from_documents(docs).filter("modality = 'image'")
        )
        .selectExpr(
            "media_id",
            *[f"feature[{i}] AS f{i}" for i in range(mm.N_FEATURES)],
        )
        .collect()
    }
    assert png_feats == bmp_feats and len(png_feats) == 10
