import glob
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import pyarrow.compute as pc
import pyarrow.parquet as pq

from varint_simd_spark.codecs.strings import FsstStr, _words8, arrow_to_bo, _hash3, _LEN_MASK

f = sorted(glob.glob("/tmp/vss_bench_10m_in/part-*.parquet"))[0]
tab = pq.read_table(f)
tab = tab.take(pc.sort_indices(tab["url"])).combine_chunks()
fs = FsstStr()
arr = tab["html"].combine_chunks()
blob_all, offs_all = arrow_to_bo(arr)
table = fs._train(blob_all, offs_all)
e = int(np.searchsorted(offs_all, fs.TILE_BYTES))
po = offs_all[: e + 1]
blob = blob_all[: po[-1]]
words = _words8(blob)
ws, we = fs._window_bounds(po)
cur = ws.astype(np.int32)
end = we.astype(np.int32)
avail = (np.repeat(end, end - cur) - np.arange(blob.size, dtype=np.int32)).astype(np.uint8)


def t(fn, reps=9):
    best = 1e9
    out = None
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        best = min(best, time.perf_counter() - t0)
    return best, out


self = table
n = blob.size
print(f"tile {n/1e3:.0f}KB")
t0, _ = t(lambda: self.match_all(blob, words, avail))
print(f"match_all total: {t0*1000:.2f}ms ({t0/n*1e9:.1f} ns/B)")

ops = {}
ops["h=_hash3(u32view)"], h = t(lambda: _hash3(words.view(np.uint32)[::2] & np.uint32(0xFFFFFF)))
ops["hi=astype(intp)"], hi = t(lambda: h.astype(np.intp))
ops["meta=take(hmeta)"], meta = t(lambda: np.take(self.hmeta, hi, mode="clip"))
ops["slen"], slen = t(lambda: (meta & np.uint16(0xFF)).astype(np.uint8))
ops["hit=avail>=slen"], hit = t(lambda: avail >= slen)
ops["sh"], sh = t(lambda: (np.uint8(8) - np.minimum(slen, np.uint8(8))) << np.uint8(3))
ops["shift+take+cmp"], _ = t(lambda: np.left_shift(words, sh) == np.take(self.hvs, hi, mode="clip"))
ops["c2=take(two,u16view)"], c2 = t(lambda: np.take(self.two, words.view(np.uint16)[::4], mode="clip"))
ops["hit2"], hit2 = t(lambda: (avail >= np.uint8(2)) & (c2 != np.uint8(0xFF)))
ops["code=take(one,blob)"], code = t(lambda: np.take(self.one, blob))
ops["blends(~5 u8 ops)"], _ = t(lambda: (
    code ^ ((code ^ c2) & np.negative(hit2.view(np.uint8)))))
for k, v in ops.items():
    print(f"  {k:24s} {v*1000:6.2f}ms")
hitmask = avail >= slen
print(f"hash-slot candidate fraction: {hitmask.mean():.3f}")
cmp = np.left_shift(words, sh) == np.take(self.hvs, hi, mode="clip")
print(f"confirmed len>=3 fraction: {(hitmask & cmp).mean():.3f}")

# variant: subset-compare for the hash path
def v_subset():
    h2 = _hash3(words.view(np.uint32)[::2] & np.uint32(0xFFFFFF))
    hi2 = h2.astype(np.intp)
    meta2 = np.take(self.hmeta, hi2, mode="clip")
    slen2 = (meta2 & np.uint16(0xFF)).astype(np.uint8)
    cand = avail >= slen2
    ci = np.flatnonzero(cand)
    hic = hi2[ci]
    slc = slen2[ci]
    shc = (np.uint8(8) - np.minimum(slc, np.uint8(8))).astype(np.uint64) * np.uint64(8)
    ok = np.left_shift(words[ci], shc) == np.take(self.hvs, hic, mode="clip")
    hitm = np.zeros(n, dtype=bool)
    hitm[ci[ok]] = True
    c2v = np.take(self.two, words.view(np.uint16)[::4], mode="clip")
    hit2v = (avail >= np.uint8(2)) & (c2v != np.uint8(0xFF))
    codev = np.take(self.one, blob)
    m2 = np.negative(hit2v.view(np.uint8))
    mlenv = hit2v.view(np.uint8) + np.uint8(1)
    codev ^= (codev ^ c2v) & m2
    m3 = np.negative(hitm.view(np.uint8))
    codev ^= (codev ^ (meta2 >> np.uint16(8)).astype(np.uint8)) & m3
    mlenv ^= (mlenv ^ slen2) & m3
    return codev, mlenv

tv, (cv, mv) = t(v_subset)
c0, m0 = self.match_all(blob, words, avail)
print(f"subset-compare variant: {tv*1000:.2f}ms  match={np.array_equal(cv,c0) and np.array_equal(mv,m0)}")
