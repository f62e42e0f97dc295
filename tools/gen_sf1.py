#!/usr/bin/env python3
"""Generate sf1 fixtures for the scale-ceiling probe (VERDICT r18 item 4).

The driver ships sf0.001/0.01/0.1 only; the 128 GiB sandbox can hold one
more 10x step, which is the cheapest available test of the engine's 100 TB
claims' CONSTANTS (memory cliffs, driver-bounded collects, band-explosion
factors). This tool builds an sf1 directory that scales the two HEAVY
tables the dedup/ANN/curation flagships actually stress:

  - documents:  50,000 rows (10x sf0.1), sampled from sf0.1's own
    empirical distributions -- word frequencies from the fixture corpus,
    words-per-doc from the fixture's n_chars shape, lang/source marginals
    -- seeded per doc_id, fully deterministic.
  - embeddings: 20,000 rows (10x sf0.1), unit-normalized dim-64 vectors
    drawn per label from the sf0.1 per-label mean + residual-std fit (the
    fixture is label-clustered; preserving that keeps near-dup/ANN pair
    densities in the same regime).

The star-schema tables (region..lineitem, events) are CARRIED from sf0.1
unchanged: no probe in the sf1 set reads them at scale, and carrying them
satisfies the Verify fixture-shape gate without inventing data the run
never touches. SCALING.md documents this choice with the run.

Usage: python3 tools/gen_sf1.py /root/testdata/sf0.1 /tmp/sf1
"""
import sys, os, shutil, random, math, collections
import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
DOCS_N = 50_000
VECS_N = 20_000
DIM = 64
LABELS = 10


def gen_documents(src, dst):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT text, lang, source, n_chars FROM '{src}/documents.parquet'"
    ).fetchall()
    words = collections.Counter()
    lens, langs, sources = [], collections.Counter(), collections.Counter()
    for text, lang, source, n_chars in rows:
        toks = text.split(" ")
        words.update(toks)
        lens.append(len(toks))
        langs[lang] += 1
        sources[source] += 1
    vocab, wcounts = zip(*sorted(words.items()))
    lang_v, lang_w = zip(*sorted(langs.items()))
    src_v, src_w = zip(*sorted(sources.items()))
    lens.sort()
    out_ids, out_text, out_lang, out_src, out_n = [], [], [], [], []
    for doc_id in range(DOCS_N):
        rng = random.Random(f"{SEED}:doc:{doc_id}")
        n_words = lens[int(rng.random() * len(lens))]
        text = " ".join(rng.choices(vocab, weights=wcounts, k=n_words))
        out_ids.append(doc_id)
        out_text.append(text)
        out_lang.append(rng.choices(lang_v, weights=lang_w, k=1)[0])
        out_src.append(rng.choices(src_v, weights=src_w, k=1)[0])
        out_n.append(len(text))
    pq.write_table(pa.table({
        "doc_id": pa.array(out_ids, pa.int64()),
        "text": pa.array(out_text, pa.string()),
        "lang": pa.array(out_lang, pa.string()),
        "source": pa.array(out_src, pa.string()),
        "n_chars": pa.array(out_n, pa.int64()),
    }), f"{dst}/documents.parquet")


def gen_embeddings(src, dst):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT label, embedding FROM '{src}/embeddings.parquet'").fetchall()
    by_label = collections.defaultdict(list)
    for label, emb in rows:
        by_label[label].append(emb)
    stats = {}
    for label, vecs in by_label.items():
        mean = [sum(v[d] for v in vecs) / len(vecs) for d in range(DIM)]
        var = sum(
            sum((v[d] - mean[d]) ** 2 for d in range(DIM)) for v in vecs
        ) / (len(vecs) * DIM)
        stats[label] = (mean, math.sqrt(var))
    out_ids, out_emb, out_label = [], [], []
    for vec_id in range(VECS_N):
        rng = random.Random(f"{SEED}:emb:{vec_id}")
        label = vec_id % LABELS
        mean, sd = stats[label]
        v = [mean[d] + rng.gauss(0.0, sd) for d in range(DIM)]
        norm = math.sqrt(sum(x * x for x in v)) or 1.0
        out_ids.append(vec_id)
        out_emb.append([float(x / norm) for x in v])
        out_label.append(label)
    pq.write_table(pa.table({
        "vec_id": pa.array(out_ids, pa.int64()),
        "embedding": pa.array(out_emb, pa.list_(pa.float32())),
        "label": pa.array(out_label, pa.int32()),
    }), f"{dst}/embeddings.parquet")


def main():
    src, dst = sys.argv[1], sys.argv[2]
    os.makedirs(dst, exist_ok=True)
    for name in ("region", "nation", "customer", "supplier", "part",
                 "orders", "lineitem", "events"):
        shutil.copyfile(f"{src}/{name}.parquet", f"{dst}/{name}.parquet")
    gen_documents(src, dst)
    gen_embeddings(src, dst)
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        print(t, con.execute(
            f"SELECT count(*) FROM '{dst}/{t}.parquet'").fetchone()[0])


if __name__ == "__main__":
    main()
