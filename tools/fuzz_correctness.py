#!/usr/bin/env python3
"""Cross-engine fuzz: build a seeded RANDOM sfDir (same schemas as the
driver testdata, but adversarial content — NULL/empty/unicode text,
planted near-dup clusters, +-1.0 embedding boundaries, events with
missing JSON keys), run graft.Verify on it, then the DuckDB oracle
compare. Proves the engine==oracle agreement generalizes beyond the
blessed testdata.

Usage: python3 tools/fuzz_correctness.py [seed] [outBase]

Respects the documented data preconditions (not bugs, contracts):
  - l_partkey/l_linenumber < 2^24 (floatBitsExpr oracle guard)
  - per-user event timestamps unique at microsecond granularity
    (the as-of join ordering convention)
"""
import json
import random
import subprocess
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

seed = int(sys.argv[1]) if len(sys.argv) > 1 else 1
base = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/graft_fuzz_{seed}"
rnd = random.Random(seed)
np.random.seed(seed)

sf_dir = f"{base}/sf"
out_dir = f"{base}/out"
import os, shutil
shutil.rmtree(base, ignore_errors=True)
os.makedirs(sf_dir)

SRC = "/root/testdata/sf0.001"

# --- TPC-H-ish tables: resample real rows (schema-exact, values in-range)
for t in ["region", "nation", "customer", "supplier", "part", "orders", "lineitem"]:
    tbl = pq.read_table(f"{SRC}/{t}.parquet")
    n = tbl.num_rows
    idx = pa.array(rnd.choices(range(n), k=n))
    pq.write_table(tbl.take(idx), f"{sf_dir}/{t}.parquet")

# --- documents: adversarial corpus
vocab = ["alpha", "beta", "gamma", "delta", "the", "a", "data", "x1", ":-)",
         "naive", "uber", "cafe", "smorgasbord",
         # unicode shapes: diacritics (BMP letters), CJK, a combining
         # sequence (NFC-normalizable) — exercises the engines' \p{L}
         # agreement and the hex()/md5 byte-level conventions on
         # multi-byte UTF-8 across every text oracle
         "café", "東京", "naïve"]
docs = []
n_docs = 400
i = 0
while i < n_docs:
    r = rnd.random()
    if r < 0.05:
        text = None                       # NULL text
    elif r < 0.10:
        text = ""                         # empty text
    elif r < 0.15:
        text = rnd.choice(vocab)          # single token (shorter than k)
    elif r < 0.35 and docs:
        # near-dup of a previous doc: one-token edit (exercises LSH paths)
        prev = docs[rnd.randrange(len(docs))][1]
        toks = (prev or "x").split(" ")
        toks[rnd.randrange(len(toks))] = rnd.choice(vocab)
        text = " ".join(toks)
    elif r < 0.40 and docs:
        text = docs[rnd.randrange(len(docs))][1]  # exact duplicate
    elif r < 0.50:
        # whitespace/contraction-adversarial: multi-space runs, tabs,
        # newlines and GPT-2 contraction suffixes (exercises the
        # pretok attach transform and whitespace-robust text oracles)
        seps = [" ", "  ", "   ", "\t", "\n", " \t", "\t ", "  \t", "\x0b ", " \x0b"]
        parts = []
        for _ in range(rnd.randrange(2, 12)):
            w = rnd.choice(vocab)
            if rnd.random() < 0.3:
                w += rnd.choice(["'s", "'t", "'re", "'ve", "'m", "'ll", "'d", "'S"])
            parts.append(w)
            parts.append(rnd.choice(seps))
        text = "".join(parts[:-1] if rnd.random() < 0.5 else parts)
    else:
        text = " ".join(rnd.choices(vocab, k=rnd.randrange(2, 40)))
    docs.append((i, text))
    i += 1
doc_tbl = pa.table({
    "doc_id": pa.array([d[0] for d in docs], pa.int64()),
    "text": pa.array([d[1] for d in docs], pa.string()),
    "lang": pa.array([rnd.choice(["en", "de", "fr"]) for _ in docs], pa.string()),
    "source": pa.array([rnd.choice(["web", "book", "code"]) for _ in docs], pa.string()),
    "n_chars": pa.array([len(d[1]) if d[1] else 0 for d in docs], pa.int64()),
})
pq.write_table(doc_tbl, f"{sf_dir}/documents.parquet")

# --- embeddings: random unit-ish vectors incl. exact +-1.0 boundaries
# dims varies by seed (>= 16 so the 4x4-dim ANN band slices exist) to
# exercise the dims-agnostic oracles, not just the testdata's 64
n_vec, dims = 300, [16, 32, 64][seed % 3]
emb = np.random.uniform(-1, 1, (n_vec, dims)).astype(np.float32)
for j in range(0, n_vec, 17):
    emb[j, j % dims] = 1.0      # the clamp boundary (round-3 ADVICE case)
    emb[j, (j + 1) % dims] = -1.0
# planted near-dup pairs for cosinePairs
for j in range(0, n_vec - 1, 23):
    emb[j + 1] = emb[j] + np.random.uniform(-0.01, 0.01, dims).astype(np.float32)
emb = np.clip(emb, -1.0, 1.0)
emb_tbl = pa.table({
    "vec_id": pa.array(range(n_vec), pa.int64()),
    "embedding": pa.array([list(map(float, v)) for v in emb], pa.list_(pa.float32())),
    "label": pa.array([rnd.randrange(10) for _ in range(n_vec)], pa.int32()),
})
pq.write_table(emb_tbl, f"{sf_dir}/embeddings.parquet")

# --- events: unique-per-user microsecond timestamps, some missing k
n_ev, n_users = 3000, 40
rows = []
used = set()
for e in range(n_ev):
    u = rnd.randrange(n_users)
    while True:
        ts_us = rnd.randrange(0, 30 * 24 * 3600 * 1000000)  # 30 days
        if (u, ts_us) not in used:
            used.add((u, ts_us))
            break
    props = {} if rnd.random() < 0.1 else {"k": rnd.randrange(200)}
    if rnd.random() < 0.2:
        props["extra"] = "pad"
    rows.append((e, ts_us * 1000 + rnd.randrange(1000),  # ns jitter below us
                 u, rnd.choice(["click", "view", "purchase", "error"]),
                 rnd.uniform(0, 500), json.dumps(props, sort_keys=True)))
ev_tbl = pa.table({
    "event_id": pa.array([r[0] for r in rows], pa.int64()),
    "ts": pa.array([r[1] for r in rows], pa.timestamp("ns")),
    "user_id": pa.array([r[2] for r in rows], pa.int64()),
    "event_type": pa.array([r[3] for r in rows], pa.string()),
    "value": pa.array([r[4] for r in rows], pa.float64()),
    "props": pa.array([r[5] for r in rows], pa.string()),
})
pq.write_table(ev_tbl, f"{sf_dir}/events.parquet")

print(f"[fuzz seed={seed}] generated {sf_dir}; running Verify...")
r = subprocess.run(
    ["sbt", "-batch", f"runMain graft.Verify {sf_dir} {out_dir}"],
    cwd="/root/repo", capture_output=True, text=True)
if r.returncode != 0 or "[verify]" in r.stderr:
    print(r.stdout[-3000:])
    print(r.stderr[-3000:])
    sys.exit(1)
print(f"[fuzz seed={seed}] Verify done; running oracle compare...")
sys.exit(subprocess.run(
    ["python3", "tools/check_correctness.py", sf_dir, out_dir],
    cwd="/root/repo").returncode)
