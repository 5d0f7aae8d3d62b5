"""Real GIF LZW decode: round-trips against the corpus generator's
clear-heavy encoder AND an independent genuinely-compressing LZW encoder
(table growth to 12 bits, KwKwK, clear-on-full)."""

import random

from obsidian_parser_spark.operators.multimodal import (
    _decode_gif_pixels,
    _gif_lzw_decode,
)
from obsidian_parser_spark.sources.corpus import gif_bytes, gif_palette


def _lzw_compress(indices, mcs):
    """A REAL compressing GIF-LZW encoder (reference implementation for
    the decoder test only): builds the string table, grows code width
    when the next free code crosses 2^width, emits CLEAR when the table
    hits 4096."""
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    table = {(i,): i for i in range(clear)}
    next_code = eoi + 1
    width = mcs + 1
    out = bytearray()
    acc = nb = 0

    def emit(code):
        nonlocal acc, nb
        acc |= code << nb
        nb += width
        while nb >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nb -= 8

    emit(clear)
    w = ()
    for k in indices:
        wk = w + (k,)
        if wk in table:
            w = wk
            continue
        emit(table[w])
        table[wk] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        w = (k,)
        if next_code == 4096:
            emit(clear)
            table = {(i,): i for i in range(clear)}
            next_code = eoi + 1
            width = mcs + 1
    if w:
        emit(table[w])
    emit(eoi)
    if nb:
        out.append(acc & 0xFF)
    return bytes(out)


def test_decoder_roundtrips_compressing_encoder():
    rng = random.Random(7)
    for trial in range(40):
        mcs = rng.choice([2, 3, 4, 8])
        n = rng.randrange(1, 4000)
        idx = [rng.randrange(1 << mcs) for _ in range(n)]
        assert _gif_lzw_decode(_lzw_compress(idx, mcs), mcs) == idx, (
            trial, mcs, n,
        )


def test_decoder_kwkwk_case():
    # constant runs force the cScSc pattern (code == next free slot)
    for mcs in (2, 4):
        idx = [1] * 500 + [0, 1] * 200
        assert _gif_lzw_decode(_lzw_compress(idx, mcs), mcs) == idx


def test_decoder_rejects_malformed():
    assert _gif_lzw_decode(b"", 2) is None  # no EOI
    # all-ones: first code is 7 ≥ clear with no prior literal
    assert _gif_lzw_decode(b"\xff\xff", 2) is None
    assert _gif_lzw_decode(b"\x00", 1) is None  # bad min code size


def test_corpus_gif_pixel_sums_match_rule():
    for g in (0, 1, 5, 11, 30):
        w, h, nf = 2 + (g * 31) % 100, 2 + (g * 17) % 100, 1 + g % 9
        out = _decode_gif_pixels(gif_bytes(w, h, n_frames=nf, g=g))
        pal = gif_palette(g)
        exp = [0, 0, 0]
        for f in range(nf):
            for y in range(h):
                for x in range(w):
                    c = pal[(x + y + f) % 4]
                    for ch in range(3):
                        exp[ch] += c[ch]
        assert out == (w, h, w * h * nf, exp[0], exp[1], exp[2]), g


def test_corrupt_gif_fails_closed():
    assert _decode_gif_pixels(b"GIFXXa" + bytes(20)) is None
    good = gif_bytes(5, 4, n_frames=2, g=1)
    assert _decode_gif_pixels(good[:-10]) is None  # truncated
