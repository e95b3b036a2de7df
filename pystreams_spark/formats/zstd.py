"""Pure-Python Zstandard codec (RFC 8878, public spec) — full decode,
a REAL compressor (r9), and a raw/RLE-block ("stored") encoder.

Why it exists: zstd is the second production landing-zone codec (with
snappy) whose C module is absent from this container. The FORMAT is
fully public — RFC 8878 plus the reference project's documented
educational decoder algorithms — and, like the Avro/PNG/GIF/JPEG work,
a spec-level implementation beats an env-gate for the read path:

- ``zstd_decompress`` implements the complete single-frame format:
  frame headers (all FCS/dict-id layouts; nonzero dictionaries
  refuse), raw / RLE / compressed blocks, literals in all four forms
  (raw, RLE, Huffman-compressed with direct or FSE-compressed weight
  tables, treeless reuse), 4-stream and 1-stream Huffman, the three
  interleaved FSE sequence streams (predefined / RLE / FSE-compressed
  / repeat table modes), full repeat-offset history semantics, and
  cross-block match windows. Skippable frames are skipped; multiple
  concatenated frames append. The optional xxhash64 content checksum
  is verified when present (pure-Python xxh64 below).
- ``zstd_compress`` (r9) is REAL compression: greedy LZ77 hash
  matching → sequences under the PREDEFINED FSE tables, literals as
  Huffman (direct weights) / RLE / raw, per-block raw fallback when
  compression does not pay. LIBZSTD (zstd-jni, Spark's classpath)
  decompresses its frames byte-exactly in the differential tests —
  encoder validation by the reference decoder itself.
- ``zstd_compress_stored`` emits a spec-valid frame of RAW/RLE blocks:
  cheapest spec-valid write path; kept for callers that want write
  speed over ratio.

Bit-level conventions ported carefully from the RFC: FSE table
descriptions read FORWARD (LSB-first); Huffman literal streams and
sequence streams read BACKWARD from a 1-bit sentinel; FSE states
interleave exactly as §4.1/§4.2 specify.

Performance posture: this is an INGESTION codec (read once → parquet),
not a hot-loop scan — same note as the Avro module's per-record
decode. Python-level bit twiddling decodes ~MB/s, fine for landing
files; a throughput pipeline should run where the C module exists.
"""

from __future__ import annotations

__all__ = ["zstd_decompress", "zstd_compress", "zstd_compress_stored"]

_MAGIC = 0xFD2FB528
_SKIP_LO, _SKIP_HI = 0x184D2A50, 0x184D2A5F

# --- sequence code tables (RFC 8878 §3.1.1.3.2.1.1) ------------------------

_LL_BASE = [
    0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,
    16, 18, 20, 22, 24, 28, 32, 40, 48, 64, 128, 256, 512, 1024,
    2048, 4096, 8192, 16384, 32768, 65536,
]
_LL_BITS = [0] * 16 + [1, 1, 1, 1, 2, 2, 3, 3, 4, 6, 7, 8, 9, 10, 11, 12,
                       13, 14, 15, 16]
_ML_BASE = [m + 3 for m in range(32)] + [
    35, 37, 39, 41, 43, 47, 51, 59, 67, 83, 99, 131, 259, 515, 1027,
    2051, 4099, 8195, 16387, 32771, 65539,
]
_ML_BITS = [0] * 32 + [1, 1, 1, 1, 2, 2, 3, 3, 4, 4, 5, 7, 8, 9, 10, 11,
                       12, 13, 14, 15, 16]

# predefined FSE distributions (RFC 8878 §3.1.1.3.2.2)
_LL_DEFAULT = (
    [4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1,
     2, 2, 2, 2, 2, 2, 2, 2, 2, 3, 2, 1, 1, 1, 1, 1,
     -1, -1, -1, -1],
    6,
)
_ML_DEFAULT = (
    [1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1,
     1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
     1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, -1, -1,
     -1, -1, -1, -1, -1],
    6,
)
_OF_DEFAULT = (
    [1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1,
     1, 1, 1, 1, 1, 1, 1, 1, -1, -1, -1, -1, -1],
    5,
)


class _Fwd:
    """LSB-first forward bit reader (FSE table descriptions)."""

    __slots__ = ("d", "pos")

    def __init__(self, data: bytes):
        self.d = data
        self.pos = 0

    def read(self, n: int) -> int:
        p = self.pos
        lo, hi = p >> 3, (p + n - 1) >> 3
        v = int.from_bytes(self.d[lo : hi + 1], "little") >> (p - 8 * lo)
        self.pos += n
        return v & ((1 << n) - 1)

    def bytes_consumed(self) -> int:
        return (self.pos + 7) >> 3


class _Back:
    """Backward bit reader: starts just below the 1-bit sentinel in the
    LAST byte and reads toward the start. ``pos`` going negative marks
    exhaustion (peeks pad with zeros, as Huffman stream tails need)."""

    __slots__ = ("d", "pos")

    def __init__(self, data: bytes):
        if not data or data[-1] == 0:
            raise ValueError("zstd: corrupted bitstream (no sentinel)")
        self.d = data
        self.pos = 8 * (len(data) - 1) + (data[-1].bit_length() - 1)

    def _bits(self, p: int, n: int) -> int:
        if n == 0:
            return 0
        lo = max(p >> 3, 0)
        hi = (p + n - 1) >> 3
        if hi < 0:
            return 0
        v = int.from_bytes(self.d[lo : hi + 1], "little")
        sh = p - 8 * lo
        v = (v >> sh) if sh >= 0 else (v << -sh)
        return v & ((1 << n) - 1)

    def read(self, n: int) -> int:
        self.pos -= n
        return self._bits(self.pos, n)

    def peek(self, n: int) -> int:
        return self._bits(self.pos - n, n)

    def skip(self, n: int) -> None:
        self.pos -= n


def _fse_read_distribution(fwd: _Fwd, max_accuracy: int):
    """RFC 4.1.1: accuracy log + normalized counts (−1 = 'less than
    one'), with the low/high split encoding and 2-bit zero-repeat
    flags."""
    accuracy = fwd.read(4) + 5
    if accuracy > max_accuracy:
        raise ValueError(f"zstd: FSE accuracy {accuracy} > {max_accuracy}")
    remaining = 1 << accuracy  # probability mass left to distribute
    counts: list[int] = []
    while remaining > 0 and len(counts) < 256:
        # a count value val ∈ [0, remaining+1] is coded in nbits-1 or
        # nbits bits with a low/high split (the reference decoder's
        # header scheme; values below `threshold` fit in nbits-1)
        nbits = (remaining + 1).bit_length()
        lower_mask = (1 << (nbits - 1)) - 1
        threshold = (1 << nbits) - 1 - (remaining + 1)
        val = fwd.read(nbits - 1)
        if val < threshold:
            pass  # nbits-1 bits were enough
        else:
            val |= fwd.read(1) << (nbits - 1)
            if val > lower_mask:
                val -= threshold
        proba = val - 1
        remaining -= -proba if proba < 0 else proba
        counts.append(proba)
        if proba == 0:
            while True:
                rep = fwd.read(2)
                counts.extend([0] * rep)
                if rep != 3:
                    break
    if remaining != 0:
        raise ValueError("zstd: corrupted FSE distribution")
    return counts, accuracy


def _fse_build(counts: list[int], accuracy: int):
    """RFC 4.1: spread symbols, then per-cell (symbol, nbits, base)."""
    size = 1 << accuracy
    table = [0] * size
    high = size - 1
    for sym, c in enumerate(counts):
        if c == -1:
            table[high] = sym
            high -= 1
    step = (size >> 1) + (size >> 3) + 3
    pos = 0
    for sym, c in enumerate(counts):
        for _ in range(max(c, 0)):
            table[pos] = sym
            pos = (pos + step) & (size - 1)
            while pos > high:
                pos = (pos + step) & (size - 1)
    if pos != 0:
        raise ValueError("zstd: FSE table spread misalignment")
    nxt = [1 if c == -1 else c for c in counts]
    cells = []
    for i in range(size):
        sym = table[i]
        x = nxt[sym]
        nxt[sym] += 1
        nbits = accuracy - (x.bit_length() - 1)
        base = (x << nbits) - size
        cells.append((sym, nbits, base))
    return cells


def _fse_rle_table(symbol: int):
    return [(symbol, 0, 0)]


def _huf_build(weights: list[int]):
    """Canonical zstd Huffman table from weights (last one inferred by
    the caller): flat 2^max_bits lookup (symbol, length)."""
    total = sum((1 << (w - 1)) for w in weights if w > 0)
    if total == 0:
        raise ValueError("zstd: empty huffman weights")
    if total & (total - 1):
        raise ValueError("zstd: huffman weights do not sum to a power of 2")
    max_bits = total.bit_length() - 1
    bits = [max_bits + 1 - w if w > 0 else 0 for w in weights]
    size = 1 << max_bits
    lut_sym = [0] * size
    lut_len = [0] * size
    rank_count = [0] * (max_bits + 1)
    for b in bits:
        rank_count[b] += 1
    rank_idx = [0] * (max_bits + 2)
    rank_idx[max_bits] = 0
    for i in range(max_bits, 0, -1):
        rank_idx[i - 1] = rank_idx[i] + rank_count[i] * (1 << (max_bits - i))
    for sym, b in enumerate(bits):
        if b == 0:
            continue
        code = rank_idx[b]
        span = 1 << (max_bits - b)
        for j in range(code, code + span):
            lut_sym[j] = sym
            lut_len[j] = b
        rank_idx[b] += span
    return lut_sym, lut_len, max_bits


def _huf_read_weights(data: bytes):
    """Huffman tree description (RFC 4.2.1): direct 4-bit weights or an
    FSE-compressed weight stream (2 interleaved states, backward).
    Returns (weights_with_last_inferred, bytes_consumed)."""
    hdr = data[0]
    if hdr >= 128:
        n = hdr - 127
        weights = []
        for i in range(n):
            b = data[1 + (i >> 1)]
            weights.append((b >> 4) if i % 2 == 0 else (b & 15))
        consumed = 1 + ((n + 1) >> 1)
    else:
        csize = hdr
        comp = data[1 : 1 + csize]
        fwd = _Fwd(comp)
        counts, accuracy = _fse_read_distribution(fwd, 6)
        cells = _fse_build(counts, accuracy)
        back = _Back(comp[fwd.bytes_consumed() :])
        s1 = back.read(accuracy)
        s2 = back.read(accuracy)
        weights = []
        while True:
            sym, nb, base = cells[s1]
            weights.append(sym)
            s1 = base + back.read(nb)
            if back.pos < 0:
                weights.append(cells[s2][0])
                break
            sym, nb, base = cells[s2]
            weights.append(sym)
            s2 = base + back.read(nb)
            if back.pos < 0:
                weights.append(cells[s1][0])
                break
            if len(weights) > 255:
                raise ValueError("zstd: >255 huffman weights")
        consumed = 1 + csize
    # infer the last weight: totals must complete to a power of two
    total = sum((1 << (w - 1)) for w in weights if w > 0)
    if total == 0:
        raise ValueError("zstd: all-zero huffman weights")
    max_bits = total.bit_length()
    left = (1 << max_bits) - total
    if left & (left - 1):
        raise ValueError("zstd: corrupted huffman weights")
    weights.append(left.bit_length())
    return weights, consumed


def _huf_decode(data: bytes, table, n_out: int) -> bytearray:
    """One backward Huffman stream → n_out symbols."""
    lut_sym, lut_len, max_bits = table
    back = _Back(data)
    out = bytearray()
    for _ in range(n_out):
        idx = back.peek(max_bits)
        ln = lut_len[idx]
        if ln == 0:
            raise ValueError("zstd: invalid huffman code")
        out.append(lut_sym[idx])
        back.skip(ln)
    return out


def _decode_literals(block: bytes, state: dict):
    """Literals section → (literals bytes, bytes consumed)."""
    b0 = block[0]
    ltype = b0 & 3
    sf = (b0 >> 2) & 3
    if ltype in (0, 1):  # raw / RLE
        if sf in (0, 2):
            regen = b0 >> 3
            consumed = 1
        elif sf == 1:
            regen = (b0 >> 4) | (block[1] << 4)
            consumed = 2
        else:
            regen = (b0 >> 4) | (block[1] << 4) | (block[2] << 12)
            consumed = 3
        if ltype == 0:
            lits = bytes(block[consumed : consumed + regen])
            if len(lits) != regen:
                raise ValueError("zstd: truncated raw literals")
            return lits, consumed + regen
        return bytes([block[consumed]]) * regen, consumed + 1
    # compressed (2) / treeless (3)
    if sf == 0:
        regen = (b0 >> 4) | ((block[1] & 0x3F) << 4)
        csize = (block[1] >> 6) | (block[2] << 2)
        consumed, streams = 3, 1
    elif sf == 1:
        regen = (b0 >> 4) | ((block[1] & 0x3F) << 4)
        csize = (block[1] >> 6) | (block[2] << 2)
        consumed, streams = 3, 4
    elif sf == 2:
        regen = (b0 >> 4) | (block[1] << 4) | ((block[2] & 3) << 12)
        csize = (block[2] >> 2) | (block[3] << 6)
        consumed, streams = 4, 4
    else:
        regen = (b0 >> 4) | (block[1] << 4) | ((block[2] & 0x3F) << 12)
        csize = (block[2] >> 6) | (block[3] << 2) | (block[4] << 10)
        consumed, streams = 5, 4
    payload = block[consumed : consumed + csize]
    if len(payload) != csize:
        raise ValueError("zstd: truncated compressed literals")
    if ltype == 2:
        weights, used = _huf_read_weights(payload)
        state["huf"] = _huf_build(weights)
        payload = payload[used:]
    elif state.get("huf") is None:
        raise ValueError("zstd: treeless literals with no previous table")
    table = state["huf"]
    if streams == 1:
        lits = _huf_decode(payload, table, regen)
    else:
        if len(payload) < 6:
            raise ValueError("zstd: truncated 4-stream jump table")
        s1 = int.from_bytes(payload[0:2], "little")
        s2 = int.from_bytes(payload[2:4], "little")
        s3 = int.from_bytes(payload[4:6], "little")
        body = payload[6:]
        if s1 + s2 + s3 > len(body):
            raise ValueError("zstd: 4-stream sizes exceed section")
        per = (regen + 3) >> 2
        lits = bytearray()
        offs = [0, s1, s1 + s2, s1 + s2 + s3, len(body)]
        for i in range(4):
            n = per if i < 3 else regen - 3 * per
            if n < 0:
                raise ValueError("zstd: negative last-stream size")
            lits += _huf_decode(body[offs[i] : offs[i + 1]], table, n)
    if len(lits) != regen:
        raise ValueError("zstd: literal count mismatch")
    return bytes(lits), consumed + csize


def _seq_table(mode: int, fwd_data: bytes, pos: int, default, max_sym: int,
               state: dict, key: str):
    """One of the three sequence tables per its 2-bit mode. Returns
    (cells, accuracy, new_pos)."""
    if mode == 0:  # predefined
        counts, accuracy = default
        cells = state.get(("pre", key))
        if cells is None:
            cells = _fse_build(counts, accuracy)
            state[("pre", key)] = cells
        state[key] = (cells, accuracy)
        return pos
    if mode == 1:  # RLE: single symbol, 0 bits
        sym = fwd_data[pos]
        if sym > max_sym:
            raise ValueError("zstd: RLE sequence symbol out of range")
        state[key] = (_fse_rle_table(sym), 0)
        return pos + 1
    if mode == 2:  # FSE-compressed
        fwd = _Fwd(fwd_data[pos:])
        counts, accuracy = _fse_read_distribution(fwd, 9 if key == "ll" else (9 if key == "ml" else 8))
        if len(counts) - 1 > max_sym:
            raise ValueError("zstd: sequence distribution too wide")
        state[key] = (_fse_build(counts, accuracy), accuracy)
        return pos + fwd.bytes_consumed()
    if state.get(key) is None:  # repeat with no previous table
        raise ValueError("zstd: repeat sequence table with no previous")
    return pos


def _decode_block(block: bytes, out: bytearray, state: dict) -> None:
    """One compressed block: literals + sequences appended to ``out``
    (which holds the whole frame so far — match windows cross blocks)."""
    lits, used = _decode_literals(block, state)
    rest = block[used:]
    if not rest:
        raise ValueError("zstd: missing sequences section")
    b0 = rest[0]
    if b0 == 0:
        out += lits
        return
    if b0 < 128:
        nseq, p = b0, 1
    elif b0 < 255:
        nseq, p = ((b0 - 128) << 8) | rest[1], 2
    else:
        nseq, p = int.from_bytes(rest[1:3], "little") + 0x7F00, 3
    modes = rest[p]
    p += 1
    ll_mode, of_mode, ml_mode = (modes >> 6) & 3, (modes >> 4) & 3, (modes >> 2) & 3
    p = _seq_table(ll_mode, rest, p, _LL_DEFAULT, 35, state, "ll")
    p = _seq_table(of_mode, rest, p, _OF_DEFAULT, 31, state, "of")
    p = _seq_table(ml_mode, rest, p, _ML_DEFAULT, 52, state, "ml")
    (ll_cells, ll_log) = state["ll"]
    (of_cells, of_log) = state["of"]
    (ml_cells, ml_log) = state["ml"]
    back = _Back(rest[p:])
    ll_state = back.read(ll_log)
    of_state = back.read(of_log)
    ml_state = back.read(ml_log)
    rep = state["rep"]
    lpos = 0
    for i in range(nseq):
        of_code = of_cells[of_state][0]
        offset_value = (1 << of_code) + back.read(of_code)
        ml_code = ml_cells[ml_state][0]
        match_len = _ML_BASE[ml_code] + back.read(_ML_BITS[ml_code])
        ll_code = ll_cells[ll_state][0]
        lit_len = _LL_BASE[ll_code] + back.read(_LL_BITS[ll_code])
        # repeat-offset resolution (RFC 3.1.1.3.2.1.1)
        if offset_value > 3:
            offset = offset_value - 3
            rep[2] = rep[1]
            rep[1] = rep[0]
            rep[0] = offset
        else:
            idx = offset_value - 1 + (1 if lit_len == 0 else 0)
            if idx == 0:
                offset = rep[0]
            elif idx == 3:
                offset = rep[0] - 1
                if offset == 0:
                    raise ValueError("zstd: repeat offset underflow")
                rep[2] = rep[1]
                rep[1] = rep[0]
                rep[0] = offset
            else:
                offset = rep[idx]
                if idx == 2:
                    rep[2] = rep[1]
                rep[1] = rep[0]
                rep[0] = offset
        out += lits[lpos : lpos + lit_len]
        lpos += lit_len
        if offset > len(out):
            raise ValueError("zstd: match offset beyond window")
        if match_len:
            start = len(out) - offset
            if offset >= match_len:
                out += out[start : start + match_len]
            else:
                pattern = bytes(out[start:])
                out += (pattern * (match_len // offset + 1))[:match_len]
        if i < nseq - 1:  # the final states are not updated
            ll_cells_e = ll_cells[ll_state]
            ll_state = ll_cells_e[2] + back.read(ll_cells_e[1])
            ml_cells_e = ml_cells[ml_state]
            ml_state = ml_cells_e[2] + back.read(ml_cells_e[1])
            of_cells_e = of_cells[of_state]
            of_state = of_cells_e[2] + back.read(of_cells_e[1])
    if back.pos < 0:
        raise ValueError("zstd: sequence bitstream overrun")
    out += lits[lpos:]


def _xxh64(data: bytes, seed: int = 0) -> int:
    """xxHash64 (public algorithm) for content-checksum verification."""
    P1, P2, P3 = 0x9E3779B185EBCA87, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9
    P4, P5 = 0x85EBCA77C2B2AE63, 0x27D4EB2F165667C5
    M = (1 << 64) - 1

    def rot(x, r):
        return ((x << r) | (x >> (64 - r))) & M

    n = len(data)
    i = 0
    if n >= 32:
        v = [(seed + P1 + P2) & M, (seed + P2) & M, seed, (seed - P1) & M]
        while i + 32 <= n:
            for j in range(4):
                lane = int.from_bytes(data[i + 8 * j : i + 8 * j + 8], "little")
                v[j] = (rot((v[j] + lane * P2) & M, 31) * P1) & M
            i += 32
        h = (rot(v[0], 1) + rot(v[1], 7) + rot(v[2], 12) + rot(v[3], 18)) & M
        for j in range(4):
            h = ((h ^ (rot((v[j] * P2) & M, 31) * P1) & M) * P1 + P4) & M
    else:
        h = (seed + P5) & M
    h = (h + n) & M
    while i + 8 <= n:
        lane = int.from_bytes(data[i : i + 8], "little")
        h = (rot(h ^ (rot((lane * P2) & M, 31) * P1) & M, 27) * P1 + P4) & M
        i += 8
    if i + 4 <= n:
        lane = int.from_bytes(data[i : i + 4], "little")
        h = (rot(h ^ (lane * P1) & M, 23) * P2 + P3) & M
        i += 4
    while i < n:
        h = (rot(h ^ (data[i] * P5) & M, 11) * P1) & M
        i += 1
    h ^= h >> 33
    h = (h * P2) & M
    h ^= h >> 29
    h = (h * P3) & M
    h ^= h >> 32
    return h


def zstd_decompress(data: bytes) -> bytes:
    """Decode one or more concatenated zstd frames. Total on arbitrary
    input: every malformed-input failure mode surfaces as ValueError
    (landing-zone bytes are untrusted)."""
    try:
        return _zstd_decompress_frames(data)
    except IndexError as exc:
        raise ValueError(f"zstd: truncated/malformed input ({exc})") from None


def _zstd_decompress_frames(data: bytes) -> bytes:
    out_all = bytearray()
    pos = 0
    n = len(data)
    while pos < n:
        if n - pos < 4:
            raise ValueError("zstd: truncated frame magic")
        magic = int.from_bytes(data[pos : pos + 4], "little")
        pos += 4
        if _SKIP_LO <= magic <= _SKIP_HI:
            size = int.from_bytes(data[pos : pos + 4], "little")
            pos += 4 + size
            continue
        if magic != _MAGIC:
            raise ValueError(f"zstd: bad magic 0x{magic:08X}")
        fhd = data[pos]
        pos += 1
        fcs_code = fhd >> 6
        single_segment = (fhd >> 5) & 1
        checksum = (fhd >> 2) & 1
        dict_code = fhd & 3
        if (fhd >> 3) & 1:
            raise ValueError("zstd: reserved frame-header bit set")
        if not single_segment:
            pos += 1  # window descriptor (we keep the whole frame anyway)
        dict_len = (0, 1, 2, 4)[dict_code]
        if dict_len:
            did = int.from_bytes(data[pos : pos + dict_len], "little")
            pos += dict_len
            if did != 0:
                raise ValueError(
                    "zstd: external-dictionary frames unsupported "
                    f"(dictionary id {did})"
                )
        fcs_len = (1 if single_segment else 0, 2, 4, 8)[fcs_code]
        fcs = None
        if fcs_len:
            fcs = int.from_bytes(data[pos : pos + fcs_len], "little")
            if fcs_len == 2:
                fcs += 256
            pos += fcs_len
        out = bytearray()
        state: dict = {"rep": [1, 4, 8]}
        while True:
            if n - pos < 3:
                raise ValueError("zstd: truncated block header")
            hdr = int.from_bytes(data[pos : pos + 3], "little")
            pos += 3
            last, btype, bsize = hdr & 1, (hdr >> 1) & 3, hdr >> 3
            if btype == 0:  # raw
                if n - pos < bsize:
                    raise ValueError("zstd: truncated raw block")
                out += data[pos : pos + bsize]
                pos += bsize
            elif btype == 1:  # RLE
                if pos >= n:
                    raise ValueError("zstd: truncated RLE block")
                out += data[pos : pos + 1] * bsize
                pos += 1
            elif btype == 2:
                _decode_block(data[pos : pos + bsize], out, state)
                pos += bsize
            else:
                raise ValueError("zstd: reserved block type")
            if last:
                break
        if fcs is not None and len(out) != fcs:
            raise ValueError(
                f"zstd: frame declared {fcs} bytes, produced {len(out)}"
            )
        if checksum:
            want = int.from_bytes(data[pos : pos + 4], "little")
            pos += 4
            got = _xxh64(bytes(out)) & 0xFFFFFFFF
            if got != want:
                raise ValueError("zstd: content checksum mismatch")
        out_all += out
    return bytes(out_all)


def zstd_compress_stored(data: bytes) -> bytes:
    """Spec-valid zstd frame of RAW blocks (no compression)."""
    out = bytearray(_MAGIC.to_bytes(4, "little"))
    n = len(data)
    if n < 256:
        fcs_code = 0
    elif n - 256 < 65536:
        fcs_code = 1
    elif n < 1 << 32:
        fcs_code = 2
    else:
        fcs_code = 3  # 8-byte FCS (RFC 8878 §3.1.1.1.2)
    fhd = (fcs_code << 6) | (1 << 5)  # single-segment, no checksum
    out.append(fhd)
    if fcs_code == 0:
        out.append(n)
    elif fcs_code == 1:
        out += (n - 256).to_bytes(2, "little")
    elif fcs_code == 2:
        out += n.to_bytes(4, "little")
    else:
        out += n.to_bytes(8, "little")
    max_block = 128 * 1024
    if n == 0:
        out += (1).to_bytes(3, "little")  # last, raw, size 0
        return bytes(out)

    # r8: runs ≥ 1 KiB become RLE blocks (btype 1 — regenerated size in
    # the header, ONE payload byte); everything else stays RAW. The run
    # scan is one C-side regex pass, so zero-padded / constant payloads
    # collapse ~128k:1 while the encoder stays trivially spec-valid.
    import re as _re

    pieces: list[tuple[int, int, int]] = []  # (btype, lo, hi)
    pos = 0
    for m in _re.finditer(rb"(.)\1{1023,}", data, _re.DOTALL):
        if m.start() > pos:
            pieces.append((0, pos, m.start()))
        pieces.append((1, m.start(), m.end()))
        pos = m.end()
    if pos < n:
        pieces.append((0, pos, n))

    blocks: list[tuple[int, bytes, int]] = []  # (btype, payload, regen)
    for btype, lo, hi in pieces:
        for blo in range(lo, hi, max_block):
            bhi = min(blo + max_block, hi)
            if btype == 1:
                blocks.append((1, data[blo : blo + 1], bhi - blo))
            else:
                blocks.append((0, data[blo:bhi], bhi - blo))
    for bi, (btype, payload, regen) in enumerate(blocks):
        last = 1 if bi == len(blocks) - 1 else 0
        out += (last | (btype << 1) | (regen << 3)).to_bytes(3, "little")
        out += payload
    return bytes(out)


# ---------------------------------------------------------------------------
# REAL compression (r9): LZ77 hash-chain matches → sequences coded with
# the PREDEFINED FSE tables (mode 0 — the same `_fse_build` cells the
# decoder uses become the encoder's transition map), literals coded as
# Huffman (direct 4-bit weights, 1 stream small / 4 streams large),
# RLE, or raw — whichever is smallest. Everything this encoder emits is
# within the decoder's supported surface, and zstd-jni (Spark's
# classpath) decompresses it — the both-direction differential that
# `zstd_compress_stored` could never give the compressed-block paths.
#
# Encoder-side FSE: the decode cell (sym, nbits, base) at index i
# recovers its normalized counter x = (base + size) >> nbits; encoding
# runs the symbol chain BACKWARD, and for a target next-state t the
# unique (x, nbits) with x = (t + size) >> nbits ∈ [count, 2·count)
# names both the cell to stand on and the bits to emit — the textbook
# tANS duality, no second table construction.
#
# Scope (stated, not hidden): offsets always use the direct form
# (offset_value = offset + 3; repeat-offset codes are a rate
# optimization the decoder handles but this encoder never emits), and
# Huffman literal trees use the DIRECT weight header up to 128
# explicit weights and the FSE-COMPRESSED weight stream beyond (the
# r9 follow-up below), so the FULL byte alphabet compresses. All
# spec-valid choices, not corners cut on correctness.
# ---------------------------------------------------------------------------


class _BitAcc:
    """Backward-bitstream builder: push fields in DECODER READ order;
    `bytes()` lays them out so `_Back` (and libzstd) reads them back in
    exactly that order, sentinel bit included."""

    __slots__ = ("acc", "n")

    def __init__(self):
        self.acc = 1  # the sentinel bit
        self.n = 0

    def push(self, v: int, nb: int) -> None:
        if nb == 0:
            return
        if not 0 <= v < (1 << nb):
            raise ValueError("zstd encode: bit field out of range")
        self.acc = (self.acc << nb) | v
        self.n += nb

    def bytes(self) -> bytes:
        total = self.n + 1
        return self.acc.to_bytes((total + 7) >> 3, "little")


def _fse_enc_map(cells: list) -> dict:
    """symbol → {normalized counter x: cell index} from decode cells."""
    size = len(cells)
    m: dict[int, dict[int, int]] = {}
    for i, (sym, nb, base) in enumerate(cells):
        m.setdefault(sym, {})[(base + size) >> nb] = i
    return m


def _fse_encode_chain(codes: list[int], cells: list, accuracy: int):
    """State chain for one channel: returns (init_state_index,
    [(bits, nbits) read at sequence i to reach sequence i+1's state])."""
    size = 1 << accuracy
    m = _fse_enc_map(cells)
    n = len(codes)
    idx = [0] * n
    trans: list[tuple[int, int]] = [(0, 0)] * (n - 1) if n > 1 else []
    xs_last = m.get(codes[-1])
    if xs_last is None:
        raise ValueError(f"zstd encode: code {codes[-1]} not in FSE table")
    idx[n - 1] = min(xs_last.values())
    for i in range(n - 2, -1, -1):
        target = idx[i + 1] + size
        xs = m.get(codes[i])
        if xs is None:
            raise ValueError(f"zstd encode: code {codes[i]} not in FSE table")
        count = len(xs)
        max_nb = accuracy - (count.bit_length() - 1)
        for nb in (max_nb, max_nb - 1):
            x = target >> nb
            if x in xs:
                idx[i] = xs[x]
                trans[i] = (target - (x << nb), nb)
                break
        else:
            raise AssertionError("zstd encode: FSE ranges failed to tile")
    return idx[0], trans


def _code_of(value: int, base: list[int], max_code: int) -> int:
    """Largest code whose baseline is <= value (bases ascend)."""
    import bisect

    c = bisect.bisect_right(base, value, 0, max_code + 1) - 1
    if c < 0:
        raise ValueError("zstd encode: value below code range")
    return c


def _find_sequences(
    data: bytes, lo: int, hi: int, max_offset: int = (1 << 29) - 3
):
    """Greedy 4-byte hash matcher over data[lo:hi]; matches may start
    anywhere in data[:i] (single-segment window). Returns
    (sequences [(lit_len, offset, match_len)], literals bytes).
    ``max_offset`` caps back-reference distance at the predefined OF
    table's reach (overridable for tests)."""
    table: dict[bytes, int] = {}
    seqs: list[tuple[int, int, int]] = []
    lits = bytearray()
    # seed the table with (a sample of) earlier positions so
    # cross-block back-references exist without a full rescan
    for j in range(max(0, lo - 4096), max(0, lo - 3)):
        table[data[j : j + 4]] = j
    i, lit_start = lo, lo
    max_ml = 131074  # ML code 52 ceiling
    max_ll = 131071  # LL code 35 ceiling
    # predefined OF table tops out at code 28 (offset_value < 2^29):
    # a farther back-reference would make _fse_encode_chain raise
    # instead of degrade — skip such matches (ADVICE r9; reachable
    # only on single payloads past ~512 MB at the default cap)
    while i + 4 <= hi:
        key = data[i : i + 4]
        j = table.get(key)
        table[key] = i
        if j is not None and data[j : j + 4] == key and i - j <= max_offset:
            ml = 4
            while i + ml < hi and ml < max_ml and data[j + ml] == data[i + ml]:
                ml += 1
            ll = i - lit_start
            if ll > max_ll:
                # split the run: flush a max-length all-literal chunk
                # by NOT matching here (rare; costs one byte of ratio)
                i += 1
                continue
            lits += data[lit_start:i]
            seqs.append((ll, i - j, ml))
            i += ml
            lit_start = i
        else:
            i += 1
    lits += data[lit_start:hi]
    return seqs, bytes(lits)


def _huf_lengths(freqs: dict[int, int], max_len: int = 11) -> dict[int, int]:
    """Code lengths: Huffman tree, clamp to ``max_len``, integer Kraft
    repair to EXACT equality (the decoder requires weight totals to
    complete a power of two)."""
    import heapq

    syms = sorted(freqs)
    if len(syms) < 2:
        raise ValueError("zstd encode: huffman needs >= 2 symbols")
    heap = [(f, i, (s,)) for i, (s, f) in enumerate(sorted(freqs.items()))]
    heapq.heapify(heap)
    nid = len(heap)
    lengths = {s: 0 for s in syms}
    while len(heap) > 1:
        fa, _, ga = heapq.heappop(heap)
        fb, _, gb = heapq.heappop(heap)
        for s in ga + gb:
            lengths[s] += 1
        heapq.heappush(heap, (fa + fb, nid, ga + gb))
        nid += 1
    for s in lengths:
        if lengths[s] > max_len:
            lengths[s] = max_len
    # Kraft sum in units of 2^-max_len; target exact 2^max_len
    target = 1 << max_len
    ksum = sum(1 << (max_len - l) for l in lengths.values())
    order = sorted(syms, key=lambda s: (lengths[s], -freqs[s]))
    guard = 0
    while ksum != target:
        guard += 1
        if guard > 10000:
            raise ValueError("zstd encode: kraft repair did not converge")
        if ksum > target:
            # lengthen the longest-codable symbol that still fits
            for s in reversed(order):
                if lengths[s] < max_len:
                    ksum -= 1 << (max_len - lengths[s] - 1)
                    lengths[s] += 1
                    break
            else:
                raise ValueError("zstd encode: kraft overflow")
        else:
            # shorten the deepest symbol whose promotion still fits
            for s in reversed(order):
                if lengths[s] > 1 and (
                    ksum + (1 << (max_len - lengths[s])) <= target
                ):
                    ksum += 1 << (max_len - lengths[s])
                    lengths[s] -= 1
                    break
            else:
                raise ValueError("zstd encode: kraft underflow")
        order.sort(key=lambda s: (lengths[s], -freqs[s]))
    return lengths


def _huf_encode_stream(payload: bytes, codes: dict[int, tuple[int, int]]):
    """One backward Huffman stream: symbols are READ first-to-last, so
    push them in order (the decoder peeks top-of-stream first)."""
    acc = _BitAcc()
    for b in payload:
        code, nb = codes[b]
        acc.push(code, nb)
    return acc.bytes()


def _huf_literals(lits: bytes):
    """Huffman-compressed literals payload (weights header + stream(s))
    or None when the direct-weight form cannot express the alphabet or
    nothing is saved. Returns (payload, n_streams)."""
    freqs: dict[int, int] = {}
    for b in lits:
        freqs[b] = freqs.get(b, 0) + 1
    if len(freqs) < 2:
        return None
    lengths = _huf_lengths(freqs)
    max_bits = max(lengths.values())
    weights = {s: max_bits + 1 - l for s, l in lengths.items()}
    last_sym = max(weights)
    # canonical codes matching `_huf_build`: longer codes first, then
    # by symbol — same rank layout, expressed as (code, len) pairs
    rank_count = [0] * (max_bits + 1)
    for l in lengths.values():
        rank_count[l] += 1
    rank_idx = [0] * (max_bits + 2)
    for i in range(max_bits, 0, -1):
        rank_idx[i - 1] = rank_idx[i] + rank_count[i] * (1 << (max_bits - i))
    codes: dict[int, tuple[int, int]] = {}
    next_at = list(rank_idx)
    for s in sorted(lengths):
        l = lengths[s]
        codes[s] = (next_at[l] >> (max_bits - l), l)
        next_at[l] += 1 << (max_bits - l)
    # weight header: direct 4-bit form up to 128 explicit weights,
    # the FSE-compressed stream beyond (r9 — full byte alphabets)
    wlist = [weights.get(s, 0) for s in range(last_sym)]
    if len(wlist) <= 128:
        hdr = bytes([127 + len(wlist)]) + bytes(
            (
                (wlist[i] << 4) | (wlist[i + 1] if i + 1 < len(wlist) else 0)
                for i in range(0, len(wlist), 2)
            )
        )
    else:
        hdr = _huf_weights_fse(wlist)
        if hdr is None:
            return None
    n = len(lits)
    if n <= 1023:
        return hdr + _huf_encode_stream(lits, codes), 1
    per = (n + 3) >> 2
    parts = [
        _huf_encode_stream(lits[i * per : min((i + 1) * per, n)], codes)
        for i in range(4)
    ]
    jump = b"".join(len(p).to_bytes(2, "little") for p in parts[:3])
    return hdr + jump + b"".join(parts), 4


def _literals_section(lits: bytes) -> bytes:
    """Smallest spec-valid literals section: RLE, Huffman, or raw."""
    n = len(lits)
    if n == 0:
        return bytes([0])  # raw, size 0, 1-byte header
    if len(set(lits)) == 1:
        if n < 32:
            return bytes([(n << 3) | 1, lits[0]])
        if n < 4096:
            return bytes([((n << 4) | 0x04 | 1) & 0xFF, n >> 4, lits[0]])
        return bytes(
            [((n << 4) | 0x0C | 1) & 0xFF, (n >> 4) & 0xFF, n >> 12, lits[0]]
        )
    huf = _huf_literals(lits) if n >= 32 else None
    if huf is not None:
        payload, streams = huf
        c = len(payload)
        overhead = 3 if (streams == 1 or (n <= 1023 and c <= 1023)) else (
            4 if (n <= 16383 and c <= 16383) else 5
        )
        if c + overhead < n:
            if streams == 1:
                b0 = (2 | (0 << 2) | ((n & 15) << 4)) & 0xFF
                hdr = bytes([b0, ((n >> 4) | ((c & 3) << 6)) & 0xFF, c >> 2])
            elif n <= 1023 and c <= 1023:
                b0 = (2 | (1 << 2) | ((n & 15) << 4)) & 0xFF
                hdr = bytes([b0, ((n >> 4) | ((c & 3) << 6)) & 0xFF, c >> 2])
            elif n <= 16383 and c <= 16383:
                b0 = (2 | (2 << 2) | ((n & 15) << 4)) & 0xFF
                hdr = bytes(
                    [
                        b0,
                        (n >> 4) & 0xFF,
                        ((n >> 12) | ((c & 0x3F) << 2)) & 0xFF,
                        c >> 6,
                    ]
                )
            else:
                # size_format 3: 5-byte header, 18-bit regen + csize
                b0 = (2 | (3 << 2) | ((n & 15) << 4)) & 0xFF
                hdr = bytes(
                    [
                        b0,
                        (n >> 4) & 0xFF,
                        ((n >> 12) & 0x3F) | ((c & 3) << 6),
                        (c >> 2) & 0xFF,
                        (c >> 10) & 0xFF,
                    ]
                )
            return hdr + payload
    # raw literals
    if n < 32:
        return bytes([n << 3]) + lits
    if n < 4096:
        return bytes([((n << 4) | 0x04) & 0xFF, n >> 4]) + lits
    return bytes([((n << 4) | 0x0C) & 0xFF, (n >> 4) & 0xFF, n >> 12]) + lits


def _sequences_section(seqs: list[tuple[int, int, int]]) -> bytes:
    """Number_of_Sequences + modes (all predefined) + the interleaved
    backward FSE/extra bitstream, in the decoder's exact read order."""
    n = len(seqs)
    if n == 0:
        return bytes([0])
    if n < 128:
        head = bytes([n])
    elif n < 0x7F00:
        head = bytes([128 + (n >> 8), n & 0xFF])
    else:
        head = bytes([255]) + (n - 0x7F00).to_bytes(2, "little")
    head += bytes([0])  # modes: LL/OF/ML all predefined

    ll_cells = _fse_build(*_LL_DEFAULT)
    of_cells = _fse_build(*_OF_DEFAULT)
    ml_cells = _fse_build(*_ML_DEFAULT)
    ll_log, of_log, ml_log = _LL_DEFAULT[1], _OF_DEFAULT[1], _ML_DEFAULT[1]

    ll_codes, of_codes, ml_codes = [], [], []
    ll_extra, of_extra, ml_extra = [], [], []
    for ll, offset, ml in seqs:
        ov = offset + 3
        oc = ov.bit_length() - 1
        of_codes.append(oc)
        of_extra.append((ov - (1 << oc), oc))
        mc = _code_of(ml, _ML_BASE, 52)
        ml_codes.append(mc)
        ml_extra.append((ml - _ML_BASE[mc], _ML_BITS[mc]))
        lc = _code_of(ll, _LL_BASE, 35)
        ll_codes.append(lc)
        ll_extra.append((ll - _LL_BASE[lc], _LL_BITS[lc]))

    ll0, ll_tr = _fse_encode_chain(ll_codes, ll_cells, ll_log)
    of0, of_tr = _fse_encode_chain(of_codes, of_cells, of_log)
    ml0, ml_tr = _fse_encode_chain(ml_codes, ml_cells, ml_log)

    acc = _BitAcc()
    acc.push(ll0, ll_log)
    acc.push(of0, of_log)
    acc.push(ml0, ml_log)
    for i in range(n):
        acc.push(*of_extra[i])
        acc.push(*ml_extra[i])
        acc.push(*ll_extra[i])
        if i < n - 1:
            acc.push(*ll_tr[i])
            acc.push(*ml_tr[i])
            acc.push(*of_tr[i])
    return head + acc.bytes()


def zstd_compress(data: bytes) -> bytes:
    """Real zstd compression (single frame, single-segment window,
    compressed blocks; raw-block fallback per block when compression
    does not pay). `zstd_decompress` AND libzstd read the output."""
    out = bytearray(_MAGIC.to_bytes(4, "little"))
    n = len(data)
    if n < 256:
        fcs_code = 0
    elif n - 256 < 65536:
        fcs_code = 1
    elif n < 1 << 32:
        fcs_code = 2
    else:
        fcs_code = 3
    out.append((fcs_code << 6) | (1 << 5))
    if fcs_code == 0:
        out.append(n)
    elif fcs_code == 1:
        out += (n - 256).to_bytes(2, "little")
    elif fcs_code == 2:
        out += n.to_bytes(4, "little")
    else:
        out += n.to_bytes(8, "little")
    if n == 0:
        out += (1).to_bytes(3, "little")
        return bytes(out)
    max_block = 128 * 1024
    blocks = [(lo, min(lo + max_block, n)) for lo in range(0, n, max_block)]
    for bi, (lo, hi) in enumerate(blocks):
        last = 1 if bi == len(blocks) - 1 else 0
        regen = hi - lo
        seqs, lits = _find_sequences(data, lo, hi)
        body = _literals_section(lits) + _sequences_section(seqs)
        if len(body) < regen:
            out += (last | (2 << 1) | (len(body) << 3)).to_bytes(3, "little")
            out += body
        else:
            out += (last | (0 << 1) | (regen << 3)).to_bytes(3, "little")
            out += data[lo:hi]
    return bytes(out)


# ---------------------------------------------------------------------------
# FSE-compressed Huffman-weight emission (r9 follow-up): lifts the
# direct-form cap (<= 128 explicit weights) so Huffman literals cover
# the FULL byte alphabet. The weight stream is the decoder's own
# 2-interleaved-state layout run in reverse: the decoder reads
# s1, s2, then alternating state updates until the stream EXHAUSTS
# mid-read — so the encoder pushes exactly m-2 update fields and must
# park the second-to-last weight on a cell with nbits > 0 (a 0-bit
# read cannot overrun, and the decoder would run past the end).
# ---------------------------------------------------------------------------


def _fse_write_distribution(counts: list[int], accuracy: int) -> bytes:
    """Inverse of `_fse_read_distribution` (RFC 4.1.1 header)."""
    out = _FwdWriter()
    out.write(accuracy - 5, 4)
    remaining = 1 << accuracy
    i = 0
    while remaining > 0:
        proba = counts[i] if i < len(counts) else 0
        val = proba + 1
        nbits = (remaining + 1).bit_length()
        lower_mask = (1 << (nbits - 1)) - 1
        threshold = (1 << nbits) - 1 - (remaining + 1)
        if val < threshold:
            out.write(val, nbits - 1)
        elif val <= lower_mask:
            out.write(val, nbits - 1)
            out.write(0, 1)
        else:
            full = val + threshold
            out.write(full & lower_mask, nbits - 1)
            out.write(1, 1)
        remaining -= -proba if proba < 0 else proba
        i += 1
        if proba == 0:
            z = 0
            while i + z < len(counts) and counts[i + z] == 0 and remaining > 0:
                z += 1
            zz = z
            while True:
                rep = min(zz, 3)
                out.write(rep, 2)
                zz -= rep
                if rep != 3:
                    break
            i += z
    return out.bytes()


class _FwdWriter:
    """LSB-first forward bit writer (FSE distribution headers)."""

    __slots__ = ("acc", "n")

    def __init__(self):
        self.acc = 0
        self.n = 0

    def write(self, v: int, k: int) -> None:
        self.acc |= (v & ((1 << k) - 1)) << self.n
        self.n += k

    def bytes(self) -> bytes:
        return self.acc.to_bytes((self.n + 7) >> 3 or 1, "little")


def _fse_normalize(freqs: dict[int, int], accuracy: int) -> list[int]:
    """Normalized counts (all >= 1 for present symbols) summing to
    2^accuracy, indexed 0..max_symbol."""
    total = sum(freqs.values())
    size = 1 << accuracy
    top = max(freqs)
    counts = [0] * (top + 1)
    for s, f in freqs.items():
        counts[s] = max(1, (f * size) // total)
    drift = size - sum(counts)
    order = sorted(freqs, key=lambda s: -freqs[s])
    gi = 0
    while drift != 0:
        s = order[gi % len(order)]
        if drift > 0:
            counts[s] += 1
            drift -= 1
        elif counts[s] > 1:
            counts[s] -= 1
            drift += 1
        gi += 1
        if gi > 100000:
            raise ValueError("zstd encode: weight normalization stuck")
    return counts


def _huf_weights_fse(wlist: list[int]) -> bytes | None:
    """FSE-compressed weight payload (header byte = csize < 128), or
    None when this stream cannot express it."""
    m = len(wlist)
    if m < 5 or m > 255:
        return None
    freqs: dict[int, int] = {}
    for w in wlist:
        freqs[w] = freqs.get(w, 0) + 1
    if len(freqs) < 2:
        return None  # degenerate; caller should use RLE-ish direct form
    accuracy = 6
    counts = _fse_normalize(freqs, accuracy)
    cells = _fse_build(counts, accuracy)
    size = 1 << accuracy
    m_map: dict[int, dict[int, int]] = {}
    for i, (sym, nb, base) in enumerate(cells):
        m_map.setdefault(sym, {})[(base + size) >> nb] = i

    chain_a = wlist[0::2]
    chain_b = wlist[1::2]
    # the second-to-last weight terminates the stream: its chain's
    # LAST cell must read > 0 bits, so pick the max-nbits cell (x =
    # count); the truly-last weight's cell is unconstrained
    second_last_in_a = (m % 2) == 0

    def chain(codes: list[int], force_bits_last: bool):
        idx = [0] * len(codes)
        trans: list[tuple[int, int]] = [(0, 0)] * (len(codes) - 1)
        xs = m_map[codes[-1]]
        if force_bits_last:
            x0 = min(xs)  # smallest counter = widest nbits
            if cells[xs[x0]][1] == 0:
                raise ValueError("zstd encode: weight cell needs bits")
            idx[-1] = xs[x0]
        else:
            idx[-1] = min(xs.values())
        for i in range(len(codes) - 2, -1, -1):
            target = idx[i + 1] + size
            xs = m_map[codes[i]]
            count = len(xs)
            max_nb = accuracy - (count.bit_length() - 1)
            for nb in (max_nb, max_nb - 1):
                x = target >> nb
                if x in xs:
                    idx[i] = xs[x]
                    trans[i] = (target - (x << nb), nb)
                    break
            else:
                raise AssertionError("zstd encode: weight FSE tiling")
        return idx, trans

    try:
        idx_a, tr_a = chain(chain_a, second_last_in_a)
        idx_b, tr_b = chain(chain_b, not second_last_in_a)
    except ValueError:
        return None

    acc = _BitAcc()
    acc.push(idx_a[0], accuracy)  # decoder reads s1 first
    acc.push(idx_b[0], accuracy)
    # alternating updates for w0..w_{m-3}
    for i in range(m - 2):
        if i % 2 == 0:
            acc.push(*tr_a[i // 2])
        else:
            acc.push(*tr_b[i // 2])
    payload = _fse_write_distribution(counts, accuracy) + acc.bytes()
    if len(payload) >= 128:
        return None
    return bytes([len(payload)]) + payload
