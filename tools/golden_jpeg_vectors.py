#!/usr/bin/env python
"""Hand-assemble three tiny baseline JPEGs per ITU-T T.81 byte layout.
Independent of pulseboard_spark: headers are explicit byte constants,
entropy data is hand-coded bit strings (DC-only blocks), expected pixels
are closed-form: IDCT of a DC-only block is flat value DC*q/8, +128 level
shift; color via the published JFIF/BT.601 inverse."""
import struct

def seg(marker, body):
    return struct.pack(">HH", marker, len(body) + 2) + body

# DQT id 0: Pq/Tq=0, 64 entries all 16 (all-equal table is zigzag-invariant)
DQT = seg(0xFFDB, bytes([0x00]) + bytes([16]*64))
# DHT: DC class0 id0: 3 codes len2 (cats 0,1,2 -> 00,01,10), 1 code len3 (cat3 -> 110)
#      AC class1 id0: 1 code len1 (EOB 0x00 -> 0)
dc_bits = [0,3,1] + [0]*13
ac_bits = [1] + [0]*15
DHT = seg(0xFFC4, bytes([0x00]) + bytes(dc_bits) + bytes([0,1,2,3])
               + bytes([0x10]) + bytes(ac_bits) + bytes([0x00]))

def sof(h, w, comps):  # comps: list of (cid, hv, tq)
    body = struct.pack(">BHHB", 8, h, w, len(comps)) + b"".join(bytes(c) for c in comps)
    return seg(0xFFC0, body)

def sos(comp_ids):
    body = bytes([len(comp_ids)]) + b"".join(bytes([c, 0x00]) for c in comp_ids) + bytes([0, 63, 0])
    return seg(0xFFDA, body)

def pack_bits(s):
    s = s + "1" * (-len(s) % 8)
    out = bytes(int(s[i:i+8], 2) for i in range(0, len(s), 8))
    assert 0xFF not in out, "would need stuffing"
    return out

# DC category codes: cat0='00', cat1='01', cat2='10', cat3='110'; EOB='0'
def dc(diff):
    if diff == 0: return "00" + "0"
    cat = diff.bit_length() if diff > 0 else (-diff).bit_length()
    code = {1: "01", 2: "10", 3: "110"}[cat]
    mag = diff if diff > 0 else diff + (1 << cat) - 1
    return code + format(mag, f"0{cat}b") + "0"   # + EOB

# Vector 1: 8x8 grayscale, one DC-only block, diff +5 -> pixel 5*16/8+128 = 138
v1 = (b"\xff\xd8" + DQT + sof(8, 8, [(1, 0x11, 0)]) + DHT
      + sos([1]) + pack_bits(dc(5)) + b"\xff\xd9")

# Vector 2: 8x8 YCbCr 4:4:4, flat: Y+4 -> 136, Cb+2 -> 132, Cr-3 -> 122
v2 = (b"\xff\xd8" + DQT + sof(8, 8, [(1, 0x11, 0), (2, 0x11, 0), (3, 0x11, 0)]) + DHT
      + sos([1, 2, 3]) + pack_bits(dc(4) + dc(2) + dc(-3)) + b"\xff\xd9")

# Vector 3: 16x16 YCbCr 4:2:0, one MCU: Y diffs +2,+2,+2,-4 (quadrants
# TL 132, TR 136, BL 140, BR 132), Cb +1 -> 130, Cr -1 -> 126
v3 = (b"\xff\xd8" + DQT + sof(16, 16, [(1, 0x22, 0), (2, 0x11, 0), (3, 0x11, 0)]) + DHT
      + sos([1, 2, 3]) + pack_bits(dc(2) + dc(2) + dc(2) + dc(-4) + dc(1) + dc(-1))
      + b"\xff\xd9")

for name, v in (("v1", v1), ("v2", v2), ("v3", v3)):
    print(name, len(v), v.hex())

# independent expected RGB (published JFIF inverse, plain float math)
def rgb(y, cb, cr):
    import math
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    def rint(x):  # numpy-style round-half-even
        f = math.floor(x); d = x - f
        if d > 0.5: return f + 1
        if d < 0.5: return f
        return f if f % 2 == 0 else f + 1
    return tuple(min(255, max(0, rint(c))) for c in (r, g, b))

print("v2 rgb:", rgb(136, 132, 122))
print("v3 TL:", rgb(132, 130, 126), "TR:", rgb(136, 130, 126),
      "BL:", rgb(140, 130, 126), "BR:", rgb(132, 130, 126))
