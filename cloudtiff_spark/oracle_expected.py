"""Independent expected-value tables for oracle checks of hash-valued ops.

``simhash`` and ``fingerprint`` are deterministic pure functions of the
documents table, but DuckDB has no xxhash64, so their oracle cannot be a
plain SQL expression. Instead this module recomputes the expected values in
straight-line Python — including a from-the-spec xxHash64 (public algorithm,
https://github.com/Cyan4973/xxHash/blob/dev/doc/xxhash_spec.md) matching
Spark's ``F.xxhash64`` (seed 42 over UTF-8 bytes) — and writes them to small
parquet files the DuckDB oracle reads back with read_parquet().

The recompute is an independent implementation (scalar Python vs Spark
expression trees / Arrow-vectorized numpy); only the MATH is shared, which
is exactly what an oracle pins down.

``image_features`` expected values are recomputed by decoding the fixture
images locally (same codecs module — the oracle therefore verifies the
distributed plumbing: bytes survive parquet+Arrow round trips, batching
doesn't reorder/corrupt, and the per-image math is applied to the right
rows) and storing full-precision doubles; the SQL applies the identical
micro-int projection on both sides (the proven bounds_agg pattern).

Everything is generated on demand and cached by file presence (fixtures are
deterministic), so repeated driver runs are cheap.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# ---------------------------------------------------------------------------
# xxHash64 (XXH64) — public spec; matches Spark F.xxhash64(<string col>)
# which hashes the UTF-8 bytes with seed 42 and returns a SIGNED long.
# ---------------------------------------------------------------------------

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _round(acc: int, inp: int) -> int:
    return (_rotl((acc + inp * _P2) & _M64, 31) * _P1) & _M64


def _merge(acc: int, val: int) -> int:
    return (((acc ^ _round(0, val)) * _P1) + _P4) & _M64


def xxh64(data: bytes, seed: int = 42) -> int:
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P1) & _M64
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M64
        h = _merge(h, v1)
        h = _merge(h, v2)
        h = _merge(h, v3)
        h = _merge(h, v4)
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = ((_rotl(h, 27) * _P1) + _P4) & _M64
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _M64
        h = ((_rotl(h, 23) * _P2) + _P3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M64
        h = (_rotl(h, 11) * _P1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


def xxh64_str(s: str, seed: int = 42) -> int:
    """Signed-long xxhash64 of a string, as Spark returns it."""
    v = xxh64(s.encode("utf-8"), seed)
    return v - (1 << 64) if v >= (1 << 63) else v


# ---------------------------------------------------------------------------
# expected-value recomputes (scalar Python mirrors of the operators' math)
# ---------------------------------------------------------------------------


def _shingles(text: str, n: int) -> list[str]:
    """Mirror of operators.dedup.shingles: split on single spaces (keeping
    empties like Spark's regex split), 1-based slices of length n (shorter at
    the tail), '_'-joined, order-preserving distinct."""
    toks = text.split(" ")
    hi = max(len(toks) - n, 0)
    grams = ["_".join(toks[i : i + n]) for i in range(hi + 1)]
    seen: dict[str, None] = {}
    for g in grams:
        seen.setdefault(g)
    return list(seen)


def expected_simhash(texts: list[tuple[int, str]], n: int = 2) -> list[tuple[int, int]]:
    out = []
    for doc_id, text in texts:
        votes = [0] * 64
        for g in _shingles(text, n):
            h = xxh64_str(g)
            for b in range(64):
                votes[b] += 1 if (h >> b) & 1 else -1
        acc = 0
        for b in range(64):
            if votes[b] > 0:
                acc += 1 << b
        acc &= _M64
        out.append((doc_id, acc - (1 << 64) if acc >= (1 << 63) else acc))
    return out


def expected_fingerprint(
    texts: list[tuple[int, str]], window: int = 8, prime: int = 1_000_003
) -> list[tuple[int, int]]:
    mod = (1 << 31) - 1
    out = []
    for doc_id, text in texts:
        cps = [ord(c) for c in text]
        if len(cps) < window:
            cps = cps + [0] * (window - len(cps))
        best = None
        for i in range(len(cps) - window + 1):
            h = 0
            for j in range(window):
                h = (h * 131 + cps[i + j]) % mod
            best = h if best is None else min(best, h)
        out.append((doc_id, best % prime))
    return out


# ---------------------------------------------------------------------------
# on-demand generation, cached by file presence
# ---------------------------------------------------------------------------


def _write_atomic(table: pa.Table, path: str) -> None:
    tmp = path + ".tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, path)


def ensure_expected(sf_dir: str, fixture_dir: str) -> str:
    """Generate expected_{simhash,fingerprint,features}.parquet under
    ``fixture_dir`` (for the documents table in ``sf_dir`` and the fixture
    images in ``fixture_dir``). Returns fixture_dir."""
    os.makedirs(fixture_dir, exist_ok=True)

    sim_path = os.path.join(fixture_dir, "expected_simhash.parquet")
    fp_path = os.path.join(fixture_dir, "expected_fingerprint.parquet")
    if not (os.path.exists(sim_path) and os.path.exists(fp_path)):
        docs = pq.read_table(
            os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
        )
        texts = list(zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist()))
        if not os.path.exists(sim_path):
            rows = expected_simhash(texts)
            _write_atomic(
                pa.table(
                    {
                        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                        "simhash": pa.array([r[1] for r in rows], pa.int64()),
                    }
                ),
                sim_path,
            )
        if not os.path.exists(fp_path):
            rows = expected_fingerprint(texts)
            _write_atomic(
                pa.table(
                    {
                        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                        "fp": pa.array([r[1] for r in rows], pa.int64()),
                    }
                ),
                fp_path,
            )

    feat_path = os.path.join(fixture_dir, "expected_features.parquet")
    if not os.path.exists(feat_path):
        from .codecs import decode_image

        imgs = pq.read_table(os.path.join(fixture_dir, "images.parquet"))
        ids, means, stds, grads = [], [], [], []
        for i in range(imgs.num_rows):
            image_id = imgs["image_id"][i].as_py()
            if not image_id.endswith("0"):  # _image_subset predicate
                continue
            arr = decode_image(
                imgs["bytes"][i].as_py(),
                imgs["fmt"][i].as_py(),
                imgs["w"][i].as_py(),
                imgs["h"][i].as_py(),
            ).astype(np.float64)
            luma = arr @ np.array([0.299, 0.587, 0.114])
            gx = np.abs(np.diff(luma, axis=1)).mean() if luma.shape[1] > 1 else 0.0
            gy = np.abs(np.diff(luma, axis=0)).mean() if luma.shape[0] > 1 else 0.0
            ids.append(image_id)
            means.append(float(arr.mean(axis=(0, 1)).round(6)[0]))
            stds.append(float(arr.std(axis=(0, 1)).round(6)[0]))
            grads.append(round(float(gx + gy), 6))
        _write_atomic(
            pa.table(
                {
                    "image_id": pa.array(ids, pa.string()),
                    "mean_r": pa.array(means, pa.float64()),
                    "std_r": pa.array(stds, pa.float64()),
                    "grad": pa.array(grads, pa.float64()),
                }
            ),
            feat_path,
        )
    return fixture_dir
