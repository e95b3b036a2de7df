"""Arithmetic-coded JPEG entropy layer (ITU-T T.81 Annexes D and F —
public spec; the QM-coder's arithmetic patents expired years ago).

This module closes the last non-environment image refusal
(`multimodal._decode_jpeg_parse` named SOF9 per row): the QM binary
arithmetic decoder (T.81 §D.2 decisions with conditional exchange, in
the textbook integer-coder register formulation; §D.1.7 byte framing —
FF followed by a stuffed 00 is a data FF, FF followed by >0x8F is a
marker that ends the scan), the probability-estimation state machine
(Table D.3, 113 adaptive states + the fixed equiprobable state used
for AC signs), and the DC/AC statistical models of §F.2.4
(conditioning categories from the DAC L/U bounds, per-position AC
bins with the Kx split, magnitude category + bit-pattern decoding per
Figures F.21-F.24, Table F.4/F.5 bin layout).

A from-scratch ENCODER (T.81 §D.1 flow: CODEMPS/CODELPS with
conditional exchange, byte output with carry propagation and the
stuff-a-0-bit-after-FF rule, §F.1.4 models) exists for test fixtures
only. Validation honesty: this offline container has NO second
arithmetic-JPEG implementation (Java ImageIO does not support
arithmetic coding; no libjpeg/ffmpeg), so bitstream-level interop
cannot be differentially tested here. What IS tested: (a) the decoder
is written from the spec's decoder flowcharts independently of the
encoder, and millions of randomized coder decisions round-trip
(hypothesis), which exercises carry/stuffing/renorm paths against the
spec-exact decoder; (b) full-image fixtures round-trip
coefficient-exactly; (c) cross-entropy-coding equivalence — the SAME
quantized coefficients encoded via our Huffman path and via this
module decode to identical pixels (entropy coding is lossless, so any
model/coder asymmetry shows up as a pixel diff). Two details are
pinned for re-verification the day an external arithmetic-JPEG codec
lands in the environment (TODO.md): the Table D.3 transition table is
transcribed from the public spec (an error there affects only
interop/compression-rate, never self-consistency), and the spec's
INITDEC/INITENC register alignment (A=0x8000 with a 7-bit C preload
vs this module's A=0x10000 with a 16-bit preload) differs from this
formulation by at most one initial renormalization — equivalent for
streams this pair produces, a 2-line change if a reference stream
ever disagrees.
"""

from __future__ import annotations

# T.81 Table D.3 — Qe value and probability-estimation state machine.
# Rows: (Qe, NMPS, NLPS, SWITCH). Index 113 is the non-adaptive
# equiprobable state the AC-sign decisions use (§F.1.4.4.1.2 note).
QE_TABLE = (
    (0x5A1D, 1, 1, 1), (0x2586, 2, 14, 0), (0x1114, 3, 16, 0),
    (0x080B, 4, 18, 0), (0x03D8, 5, 20, 0), (0x01DA, 6, 23, 0),
    (0x00E5, 7, 25, 0), (0x006F, 8, 28, 0), (0x0036, 9, 30, 0),
    (0x001A, 10, 33, 0), (0x000D, 11, 35, 0), (0x0006, 12, 9, 0),
    (0x0003, 13, 10, 0), (0x0001, 13, 12, 0), (0x5A7F, 15, 15, 1),
    (0x3F25, 16, 36, 0), (0x2CF2, 17, 38, 0), (0x207C, 18, 39, 0),
    (0x17B9, 19, 40, 0), (0x1182, 20, 42, 0), (0x0CEF, 21, 43, 0),
    (0x09A1, 22, 45, 0), (0x072F, 23, 46, 0), (0x055C, 24, 48, 0),
    (0x0406, 25, 49, 0), (0x0303, 26, 51, 0), (0x0240, 27, 52, 0),
    (0x01B1, 28, 54, 0), (0x0144, 29, 56, 0), (0x00F5, 30, 57, 0),
    (0x00B7, 31, 59, 0), (0x008A, 32, 60, 0), (0x0068, 33, 62, 0),
    (0x004E, 34, 63, 0), (0x003B, 35, 32, 0), (0x002C, 9, 33, 0),
    (0x5AE1, 37, 37, 1), (0x484C, 38, 64, 0), (0x3A0D, 39, 65, 0),
    (0x2EF1, 40, 67, 0), (0x261F, 41, 68, 0), (0x1F33, 42, 69, 0),
    (0x19A8, 43, 70, 0), (0x1518, 44, 72, 0), (0x1177, 45, 73, 0),
    (0x0E74, 46, 74, 0), (0x0BFB, 47, 75, 0), (0x09F8, 48, 77, 0),
    (0x0861, 49, 78, 0), (0x0706, 50, 79, 0), (0x05CD, 51, 48, 0),
    (0x04DE, 52, 50, 0), (0x040F, 53, 50, 0), (0x0363, 54, 51, 0),
    (0x02D4, 55, 52, 0), (0x025C, 56, 53, 0), (0x01F8, 57, 54, 0),
    (0x01A4, 58, 55, 0), (0x0160, 59, 56, 0), (0x0125, 60, 57, 0),
    (0x00F6, 61, 58, 0), (0x00CB, 62, 59, 0), (0x00AB, 63, 61, 0),
    (0x008F, 32, 61, 0), (0x5B12, 65, 65, 1), (0x4D04, 66, 80, 0),
    (0x412C, 67, 81, 0), (0x37D8, 68, 82, 0), (0x2FE8, 69, 83, 0),
    (0x293C, 70, 84, 0), (0x2379, 71, 86, 0), (0x1EDF, 72, 87, 0),
    (0x1AA9, 73, 87, 0), (0x174E, 74, 72, 0), (0x1424, 75, 72, 0),
    (0x119C, 76, 74, 0), (0x0F6B, 77, 74, 0), (0x0D51, 78, 75, 0),
    (0x0BB6, 79, 77, 0), (0x0A40, 48, 77, 0), (0x5832, 81, 80, 1),
    (0x4D1C, 82, 88, 0), (0x438E, 83, 89, 0), (0x3BDD, 84, 90, 0),
    (0x34EE, 85, 91, 0), (0x2EAE, 86, 92, 0), (0x299A, 87, 93, 0),
    (0x2516, 71, 86, 0), (0x5570, 89, 88, 1), (0x4CA9, 90, 95, 0),
    (0x44D9, 91, 96, 0), (0x3E22, 92, 97, 0), (0x3824, 93, 99, 0),
    (0x32B4, 94, 99, 0), (0x2E17, 86, 93, 0), (0x56A8, 96, 95, 1),
    (0x4F46, 97, 101, 0), (0x47E5, 98, 102, 0), (0x41CF, 99, 103, 0),
    (0x3C3D, 100, 104, 0), (0x375E, 93, 99, 0), (0x5231, 102, 105, 0),
    (0x4C0F, 103, 106, 0), (0x4639, 104, 107, 0), (0x415E, 99, 103, 0),
    (0x5627, 106, 105, 1), (0x50E7, 107, 108, 0), (0x4B85, 103, 109, 0),
    (0x5597, 109, 110, 0), (0x504F, 110, 111, 0), (0x5A10, 111, 110, 1),
    (0x5522, 112, 112, 0), (0x59EB, 112, 112, 1),
    (0x5A1D, 113, 113, 0),  # fixed equiprobable state (AC sign)
)

FIXED_BIN = 113

# statistics-area sizes (Tables F.4 / F.5)
DC_STAT_BINS = 64
AC_STAT_BINS = 256


def new_stats(n: int) -> list:
    """n context bins, each a mutable [state_index, mps] pair."""
    return [[0, 0] for _ in range(n)]


def fixed_stat() -> list:
    """The never-adapting equiprobable bin (AC sign)."""
    return [FIXED_BIN, 0]


class ArithDecoder:
    """QM decoder over one entropy-coded interval — the textbook
    integer-arithmetic-coder formulation of T.81 §D.2 (the spec's
    C/Chigh register split batches the same bit feed; decisions,
    conditional exchange, and the state machine are identical).

    Byte framing per §D.1.7: an 0xFF data byte is followed by a
    stuffed 0x00 (consumed and discarded); an 0xFF followed by
    anything > 0x8F is a real marker — the decoder stops consuming
    there (``self.pos`` ends on the 0xFF) and pads with 0-bits, which
    is safe because the encoder's flush emits every bit that can
    influence a real decision.
    """

    __slots__ = ("data", "pos", "c", "a", "_bit", "_cur", "_end", "_destuffed")

    def __init__(self, data: bytes, pos: int = 0, destuffed: bool = False):
        # destuffed=True: ``data`` already had FF 00 → FF applied and
        # markers stripped (the `_jpeg_entropy_intervals` path) — every
        # byte is data, exhaustion pads with zeros
        self.data = data
        self.pos = pos
        self._destuffed = destuffed
        self._bit = 0  # bits of _cur already consumed
        self._cur = 0
        self._end = False
        self.a = 0x10000
        c = 0
        for _ in range(16):
            c = (c << 1) | self._next_bit()
        self.c = c

    def _next_byte(self) -> int:
        if self._end:
            return 0
        d, p = self.data, self.pos
        if p >= len(d):
            self._end = True
            return 0
        b = d[p]
        if b != 0xFF or self._destuffed:
            self.pos = p + 1
            return b
        if p + 1 < len(d) and d[p + 1] == 0x00:
            self.pos = p + 2  # stuffed zero byte: data is 0xFF
            return 0xFF
        self._end = True  # marker (or truncation): stop before the FF
        return 0

    def _next_bit(self) -> int:
        if self._bit == 0:
            self._cur = self._next_byte()
            self._bit = 8
        self._bit -= 1
        return (self._cur >> self._bit) & 1

    def decode(self, st: list) -> int:
        """One binary decision against context bin ``st`` ([idx, mps]),
        per Figure D.17 with conditional exchange (LPS subinterval at
        the bottom of the current interval)."""
        idx, mps = st
        qe, nmps, nlps, switch = QE_TABLE[idx]
        self.a -= qe
        if self.c < qe:
            # bottom subinterval: LPS, unless exchange (A < Qe)
            if self.a < qe:
                d = mps
                st[0] = nmps
            else:
                d = 1 - mps
                if switch:
                    st[1] = 1 - mps
                st[0] = nlps
            self.a = qe
        else:
            self.c -= qe
            if self.a >= 0x8000:
                return mps
            if self.a < qe:
                d = 1 - mps
                if switch:
                    st[1] = 1 - mps
                st[0] = nlps
            else:
                d = mps
                st[0] = nmps
        while self.a < 0x8000:
            self.a <<= 1
            self.c = (self.c << 1) | self._next_bit()
        return d


class ArithEncoder:
    """QM encoder (fixture-side), exact mirror of ``ArithDecoder``:
    same interval arithmetic, with the interval base kept as an
    arbitrary-precision integer so carry propagation is free —
    emission happens once, at ``flush()``, where the base's bit string
    IS the code stream (zero-extension by the decoder's padding stays
    inside the final interval because base < base + A). FF bytes get
    the §D.1.7 stuffed 0x00."""

    __slots__ = ("low", "a", "nbits")

    def __init__(self):
        self.low = 0
        self.a = 0x10000
        self.nbits = 0

    def code(self, st: list, bit: int) -> None:
        idx, mps = st
        qe, nmps, nlps, switch = QE_TABLE[idx]
        self.a -= qe
        if bit == mps:
            if self.a >= 0x8000:
                self.low += qe
                return
            if self.a < qe:
                self.a = qe  # exchange: MPS takes the bottom interval
            else:
                self.low += qe
            st[0] = nmps
        else:
            if self.a < qe:
                self.low += qe  # exchange: LPS takes the top interval
            else:
                self.a = qe
            if switch:
                st[1] = 1 - mps
            st[0] = nlps
        while self.a < 0x8000:
            self.a <<= 1
            self.low <<= 1
            self.nbits += 1

    def flush(self) -> bytes:
        total = self.nbits + 16  # invariant: low < 2^total
        nbytes = -(-total // 8)
        raw = (self.low << (8 * nbytes - total)).to_bytes(nbytes, "big")
        out = bytearray()
        for b in raw:
            out.append(b)
            if b == 0xFF:
                out.append(0x00)
        return bytes(out)


class _CondState:
    """Per-scan statistics areas + predictors (reset at restarts)."""

    def __init__(self, comps, dc_cond, ac_cond):
        self.dc_stats = {}
        self.ac_stats = {}
        self.fixed = fixed_stat()
        for c in comps:
            self.dc_stats.setdefault(c["td"], new_stats(DC_STAT_BINS))
            self.ac_stats.setdefault(c["ta"], new_stats(AC_STAT_BINS))
        self.dc_cond = dc_cond  # table id → (L, U)
        self.ac_cond = ac_cond  # table id → Kx
        self.last_dc = {}
        self.dc_context = {}

    def reset(self, comps) -> None:
        for st in self.dc_stats.values():
            for bin_ in st:
                bin_[0] = bin_[1] = 0
        for st in self.ac_stats.values():
            for bin_ in st:
                bin_[0] = bin_[1] = 0
        self.fixed = fixed_stat()
        self.last_dc = {c["id"]: 0 for c in comps}
        self.dc_context = {c["id"]: 0 for c in comps}


def _decode_dc(dec: ArithDecoder, cs: _CondState, cid: int, td: int,
               differential: bool = False) -> int:
    """§F.2.4.1 — one DC difference; updates predictor + context.
    ``differential=True`` (r9, hierarchical frames — T.81 J.1/F.1.4.1):
    the coded value IS the difference-image DC, predictors stay out of
    the loop (prediction is zero and never accumulates); conditioning
    still classifies the coded value, as in non-differential frames."""
    stats = cs.dc_stats[td]
    lo, up = cs.dc_cond.get(td, (0, 1))
    s0 = cs.dc_context[cid]
    if dec.decode(stats[s0]) == 0:
        cs.dc_context[cid] = 0
        return 0 if differential else cs.last_dc[cid]
    sign = dec.decode(stats[s0 + 1])
    st = s0 + 2 + sign
    m = dec.decode(stats[st])
    if m:
        st = 20  # X1 (Table F.4)
        while dec.decode(stats[st]):
            m <<= 1
            if m == 0x8000:
                raise ValueError("jpeg arith: DC magnitude overflow")
            st += 1
    # conditioning category for the NEXT block (§F.1.4.4.1.2)
    if m < ((1 << lo) >> 1):
        cs.dc_context[cid] = 0
    elif m > ((1 << up) >> 1):
        cs.dc_context[cid] = 12 + 4 * sign
    else:
        cs.dc_context[cid] = 4 + 4 * sign
    v = m
    st += 14  # M bins follow the X bins (Table F.4)
    m >>= 1
    while m:
        if dec.decode(stats[st]):
            v |= m
        m >>= 1
    v += 1
    if sign:
        v = -v
    if differential:
        return v
    cs.last_dc[cid] += v
    return cs.last_dc[cid]


def _decode_ac(dec: ArithDecoder, cs: _CondState, ta: int, zz,
               ss: int = 1, se: int = 63, al: int = 0) -> None:
    """§F.2.4.2 — AC coefficients of the spectral band ``ss..se`` into
    the zigzag block ``zz`` (progressive first scans pass the band +
    the successive-approximation shift ``al``; sequential = 1..63/0)."""
    stats = cs.ac_stats[ta]
    kx = cs.ac_cond.get(ta, 5)
    k = ss
    while k <= se:
        st = 3 * (k - 1)
        if dec.decode(stats[st]):
            return  # EOB
        while dec.decode(stats[st + 1]) == 0:
            st += 3
            k += 1
            if k > se:
                raise ValueError("jpeg arith: AC run past the band end")
        sign = dec.decode(cs.fixed)
        st += 2
        m = dec.decode(stats[st])
        if m and dec.decode(stats[st]):
            m = 2
            st = 189 if k <= kx else 217  # X2 areas (Table F.5)
            while dec.decode(stats[st]):
                m <<= 1
                if m == 0x8000:
                    raise ValueError("jpeg arith: AC magnitude overflow")
                st += 1
        v = m
        st += 14
        m >>= 1
        while m:
            if dec.decode(stats[st]):
                v |= m
            m >>= 1
        v += 1
        zz[k] = (-v if sign else v) << al
        k += 1


def _decode_dc_refine(dec: ArithDecoder, cs: _CondState) -> int:
    """§G DC successive-approximation correction: ONE fixed-bin
    decision per block — returns the bit."""
    return dec.decode(cs.fixed)


def _decode_ac_refine(dec: ArithDecoder, cs: _CondState, ta: int, zz,
                      ss: int, se: int, al: int) -> None:
    """§G.2 AC successive-approximation refinement: previously
    significant coefficients take a correction decision at the
    position's st+2 bin (their Al bit is clear by construction, so a
    1 simply sets it); zero-history positions walk st+1 decisions
    until a newly-significant coefficient (fixed-bin sign); positions
    past the previous stage's end-of-block carry an EOB decision."""
    stats = cs.ac_stats[ta]
    p1 = 1 << al
    m1 = -1 << al
    kex = 0
    for i in range(se, ss - 1, -1):
        if zz[i]:
            kex = i
            break
    k = ss
    while k <= se:
        st = 3 * (k - 1)
        if k > kex and dec.decode(stats[st]):
            return  # EOB
        while True:
            if zz[k]:
                if dec.decode(stats[st + 2]):
                    zz[k] += p1 if zz[k] >= 0 else m1
                break
            if dec.decode(stats[st + 1]):
                zz[k] = m1 if dec.decode(cs.fixed) else p1
                break
            st += 3
            k += 1
            if k > se:
                raise ValueError("jpeg arith: AC refinement run past band")
        k += 1


def _encode_dc(enc: ArithEncoder, cs: _CondState, cid: int, td: int,
               dc: int, differential: bool = False) -> None:
    """§F.1.4.1 mirror of _decode_dc (``differential``: the value
    passed IS the coded difference; predictors untouched)."""
    stats = cs.dc_stats[td]
    lo, up = cs.dc_cond.get(td, (0, 1))
    s0 = cs.dc_context[cid]
    if differential:
        v = dc
    else:
        v = dc - cs.last_dc[cid]
        cs.last_dc[cid] = dc
    if v == 0:
        enc.code(stats[s0], 0)
        cs.dc_context[cid] = 0
        return
    enc.code(stats[s0], 1)
    sign = 1 if v < 0 else 0
    enc.code(stats[s0 + 1], sign)
    mag = (-v if sign else v) - 1
    st = s0 + 2 + sign
    if mag == 0:
        enc.code(stats[st], 0)
        m = 0
    else:
        enc.code(stats[st], 1)
        m = 1
        st = 20
        while mag >= (m << 1):
            enc.code(stats[st], 1)
            m <<= 1
            st += 1
        enc.code(stats[st], 0)
    if m < ((1 << lo) >> 1):
        cs.dc_context[cid] = 0
    elif m > ((1 << up) >> 1):
        cs.dc_context[cid] = 12 + 4 * sign
    else:
        cs.dc_context[cid] = 4 + 4 * sign
    st += 14
    mm = m >> 1
    while mm:
        enc.code(stats[st], 1 if mag & mm else 0)
        mm >>= 1


def _encode_ac(enc: ArithEncoder, cs: _CondState, ta: int, zz,
               ss: int = 1, se: int = 63, al: int = 0) -> None:
    """§F.1.4.2 mirror of _decode_ac (band + point transform: AC uses
    magnitude shift, i.e. division truncating toward zero)."""
    stats = cs.ac_stats[ta]
    kx = cs.ac_cond.get(ta, 5)

    def pt(k):  # point-transformed coefficient at k
        v = int(zz[k])
        return -(-v >> al) if v < 0 else v >> al

    # last position nonzero AFTER the point transform
    ke = 0
    for k in range(se, ss - 1, -1):
        if pt(k):
            ke = k
            break
    k = ss
    while k <= ke:
        st = 3 * (k - 1)
        enc.code(stats[st], 0)  # not EOB
        while pt(k) == 0:
            enc.code(stats[st + 1], 0)
            st += 3
            k += 1
        enc.code(stats[st + 1], 1)
        v = pt(k)
        sign = 1 if v < 0 else 0
        enc.code(cs.fixed, sign)
        mag = (-v if sign else v) - 1
        st += 2
        if mag == 0:
            enc.code(stats[st], 0)
            m = 0
        else:
            enc.code(stats[st], 1)
            if mag == 1:
                enc.code(stats[st], 0)
                m = 1
            else:
                enc.code(stats[st], 1)
                m = 2
                st = 189 if k <= kx else 217
                while mag >= (m << 1):
                    enc.code(stats[st], 1)
                    m <<= 1
                    st += 1
                enc.code(stats[st], 0)
        st += 14
        mm = m >> 1
        while mm:
            enc.code(stats[st], 1 if mag & mm else 0)
            mm >>= 1
        k += 1
    if ke < se:
        st = 3 * (k - 1)
        enc.code(stats[st], 1)  # EOB


def _encode_dc_refine(enc: ArithEncoder, cs: _CondState, bit: int) -> None:
    enc.code(cs.fixed, bit)


def _encode_ac_refine(enc: ArithEncoder, cs: _CondState, ta: int, zz,
                      ss: int, se: int, al: int) -> None:
    """§G.2 mirror of _decode_ac_refine: zz holds the FULL-precision
    quantized coefficients; this stage emits bit ``al`` of each."""
    stats = cs.ac_stats[ta]

    def mag_shift(k, shift):
        v = int(zz[k])
        return (-v if v < 0 else v) >> shift

    ke = 0
    for i in range(se, ss - 1, -1):
        if mag_shift(i, al):
            ke = i
            break
    kex = 0
    for i in range(ke, ss - 1, -1):
        if mag_shift(i, al + 1):
            kex = i
            break
    k = ss
    while k <= ke:
        st = 3 * (k - 1)
        if k > kex:
            enc.code(stats[st], 0)  # not EOB yet
        while True:
            t = mag_shift(k, al)
            if t:
                if t > 1:  # previously significant: correction bit
                    enc.code(stats[st + 2], t & 1)
                else:  # newly significant at this stage
                    enc.code(stats[st + 1], 1)
                    enc.code(cs.fixed, 1 if int(zz[k]) < 0 else 0)
                break
            enc.code(stats[st + 1], 0)
            st += 3
            k += 1
        k += 1
    if k <= se:
        st = 3 * (k - 1)
        enc.code(stats[st], 1)  # EOB


# ---------------------------------------------------------------------------
# Lossless arithmetic statistical model (T.81 Annex H — r9). Used by
# SOF11 (lossless arithmetic) and SOF15 (differential lossless
# arithmetic, hierarchical frames).
#
# Layout (Table H.2's 158-bin statistics area): 25 two-dimensional
# contexts — the 5-category classifications of the difference coded
# for the sample ABOVE (Db) and to the LEFT (Da) — each holding 4
# bins (zero decision S0, sign SS, first-magnitude SP/SN), followed
# by TWO magnitude areas (X1..X15 + M2..M15 = 29 bins each), selected
# by whether Db classifies as large.
#
# PINNED FOR RE-VERIFICATION (same honesty protocol as the module
# header: no external arithmetic-lossless codec exists offline, so
# these structural choices are validated by mirror-encoder roundtrips
# and totality fuzz, not interop): (a) the context index orders Db
# major / Da minor; (b) the magnitude-area selector is Db's class;
# (c) the 5-category classification reuses the DC conditioning rule
# verbatim (the m-space thresholds from the DAC L/U bounds, defaults
# L=0 U=1) — each is a one-line change if a reference stream ever
# disagrees. An error here cannot corrupt silently: both ends share
# the table, and foreign streams would desync into the coder's loud
# overflow/truncation errors.
# ---------------------------------------------------------------------------

LL_STAT_BINS = 158


def _ll_classify(v: int, lo: int, up: int) -> int:
    """5-category classification of a neighbor difference: 0, +small
    (1), −small (2), +large (3), −large (4) — via the DC rule's
    m-space (MSB marker of |v|−1 vs the (1<<L)>>1 / (1<<U)>>1
    bounds)."""
    if v == 0:
        return 0
    sign = 1 if v < 0 else 0
    mag = -v if v < 0 else v
    m = 0
    if mag > 1:
        m = 1
        while (m << 1) <= mag - 1:
            m <<= 1
    if m < ((1 << lo) >> 1):
        return 0  # conditioning treats it as zero-class
    if m > ((1 << up) >> 1):
        return 3 + sign
    return 1 + sign


def _decode_ll(dec: ArithDecoder, stats: list, da: int, db: int,
               lo: int, up: int) -> int:
    """One lossless difference value (Annex H decode flow: zero
    decision → sign → magnitude category walk → magnitude bits)."""
    ca, cb = _ll_classify(da, lo, up), _ll_classify(db, lo, up)
    s0 = 4 * (5 * cb + ca)
    if dec.decode(stats[s0]) == 0:
        return 0
    sign = dec.decode(stats[s0 + 1])
    m = dec.decode(stats[s0 + 2 + sign])
    if m:
        st = 100 + (29 if cb >= 3 else 0)  # X1 of the selected area
        while dec.decode(stats[st]):
            m <<= 1
            if m == 0x10000:
                raise ValueError("jpeg arith: lossless magnitude overflow")
            st += 1
    else:
        st = 100 + (29 if cb >= 3 else 0)
    v = m
    # M_k sits 14 past X_k (the Table F.4 X->M distance: 15 X bins,
    # 14 M bins, both indexed by the magnitude category)
    st += 14
    m >>= 1
    while m:
        if dec.decode(stats[st]):
            v |= m
        m >>= 1
    v += 1
    return -v if sign else v


def _encode_ll(enc: ArithEncoder, stats: list, da: int, db: int,
               lo: int, up: int, v: int) -> None:
    """Annex H encode mirror of _decode_ll."""
    ca, cb = _ll_classify(da, lo, up), _ll_classify(db, lo, up)
    s0 = 4 * (5 * cb + ca)
    if v == 0:
        enc.code(stats[s0], 0)
        return
    enc.code(stats[s0], 1)
    sign = 1 if v < 0 else 0
    enc.code(stats[s0 + 1], sign)
    mag = (-v if sign else v) - 1
    st = s0 + 2 + sign
    xbase = 100 + (29 if cb >= 3 else 0)
    if mag == 0:
        enc.code(stats[st], 0)
        m = 0
        st = xbase
    else:
        enc.code(stats[st], 1)
        m = 1
        st = xbase
        while mag >= (m << 1):
            enc.code(stats[st], 1)
            m <<= 1
            if m == 0x10000:
                raise ValueError("jpeg arith: lossless magnitude overflow")
            st += 1
        enc.code(stats[st], 0)
    st += 14
    mm = m >> 1
    while mm:
        enc.code(stats[st], 1 if mag & mm else 0)
        mm >>= 1
