"""Entropy-layer round-trips (utils/bitstream.py): bit IO, canonical Huffman,
serialized tables. Encoder and decoder are independent implementations; these
round-trips are the verification the BasisLZ texture path builds on
(scene/basis_lz.py — no external vectors exist in this environment)."""

import random

import numpy as np
import pytest

from androidrenderer_tpu.utils.bitstream import (
    BitReader, BitWriter, HuffmanTable, MAX_CODE_SIZE,
    read_huffman_table, write_huffman_table,
)


def test_bit_io_roundtrip():
    rng = random.Random(7)
    fields = [(rng.getrandbits(n), n) for n in rng.choices(range(1, 25), k=500)]
    bw = BitWriter()
    for v, n in fields:
        bw.put_bits(v, n)
    data = bw.finish()
    br = BitReader(data)
    for v, n in fields:
        assert br.get_bits(n) == v


def test_vlq_roundtrip():
    values = [0, 1, 127, 128, 255, 256, 10**6, 2**40 + 12345]
    bw = BitWriter()
    for v in values:
        bw.put_vlq(v)
    br = BitReader(bw.finish())
    for v in values:
        assert br.get_vlq() == v


def test_bit_reader_truncation_raises():
    br = BitReader(b"\xff")
    br.get_bits(8)
    with pytest.raises(ValueError):
        br.get_bits(1)


@pytest.mark.parametrize("alphabet,seed", [(4, 0), (47, 1), (256, 2), (4096, 3)])
def test_huffman_symbol_roundtrip(alphabet, seed):
    rng = np.random.default_rng(seed)
    # Skewed frequencies force a wide range of code lengths.
    syms = (rng.zipf(1.3, size=4000) - 1) % alphabet
    table = HuffmanTable.from_symbols(syms.tolist(), alphabet)
    assert max(table.lens) <= MAX_CODE_SIZE
    bw = BitWriter()
    for s in syms:
        table.encode(bw, int(s))
    br = BitReader(bw.finish())
    for s in syms:
        assert table.decode(br) == s


def test_huffman_single_symbol():
    table = HuffmanTable.from_symbols([5] * 10, 8)
    bw = BitWriter()
    for _ in range(3):
        table.encode(bw, 5)
    br = BitReader(bw.finish())
    for _ in range(3):
        assert table.decode(br) == 5


@pytest.mark.parametrize("alphabet,seed", [(21, 0), (300, 1), (2048, 2)])
def test_table_serialization_roundtrip(alphabet, seed):
    rng = np.random.default_rng(seed)
    syms = ((rng.zipf(1.5, size=2000) - 1) % alphabet).tolist()
    # Sparse alphabets exercise the zero-run codes.
    syms = [s for s in syms if s % 3 != 1] or [0]
    table = HuffmanTable.from_symbols(syms, alphabet)
    bw = BitWriter()
    write_huffman_table(bw, table)
    table.encode(bw, syms[0])
    br = BitReader(bw.finish())
    rt = read_huffman_table(br)
    assert rt.lens == table.lens[: len(rt.lens)]
    assert all(l == 0 for l in table.lens[len(rt.lens):])
    assert rt.decode(br) == syms[0]


def test_kraft_inequality_after_length_limit():
    # 40k copies of a geometric distribution would want depth > 16 unlimited.
    freqs = [2**i for i in range(24, 0, -1)]
    table = HuffmanTable.from_frequencies(freqs)
    assert max(table.lens) <= MAX_CODE_SIZE
    assert sum(2.0 ** -l for l in table.lens if l) <= 1.0 + 1e-12
