"""Train the committed BPE merges table deterministically. Re-running
reproduces the file byte-identically (train_bpe is fully
deterministic).

Training mix: the synthetic sf0.001 documents corpus (which alone has
only ~61 distinct pre-tokens and fully tokenizes after ~127 merges)
plus the committed extraction goldens (real scientific English,
already in-repo) — giving a production-shaped subword table. Both
sources are deterministic and versioned.

    python scripts/train_bpe_merges.py [n_merges]
"""

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from neurostore_text_extraction_spark.functions.bpe import dump_merges, train_bpe

N_MERGES = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
SRC = "/root/testdata/sf0.001/documents.parquet"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

texts = [
    r[0]
    for r in duckdb.sql(
        f"SELECT text FROM read_parquet('{SRC}') ORDER BY doc_id"
    ).fetchall()
    if r[0]
]
for p in sorted(glob.glob(os.path.join(REPO, "tests", "goldens", "*.txt"))):
    with open(p) as f:
        texts.append(f.read())

merges = train_bpe(texts, N_MERGES)
out = os.path.join(
    REPO, "neurostore_text_extraction_spark", "resources", "bpe_merges.txt"
)
with open(out, "w") as f:
    f.write(
        f"# byte-level BPE merges ({len(merges)}), trained on sf0.001 "
        "documents + tests/goldens by scripts/train_bpe_merges.py "
        "(deterministic)\n"
    )
    f.write(dump_merges(merges) + "\n")
print(f"wrote {len(merges)} merges to {out}")
