"""Train the committed BPE merges table deterministically. Re-running
reproduces the file byte-identically (train_bpe is fully
deterministic).

Training mix: the synthetic sf0.001 documents corpus (which alone has
only ~61 distinct pre-tokens and fully tokenizes after ~127 merges)
plus the committed extraction goldens (real scientific English) plus
the committed 24-language langid seed lines (multilingual byte
coverage for the byte-level alphabet). All sources are deterministic
and versioned.

SATURATION: BPE merges stop when no pair occurs >= 2 times. This
corpus supports 9,575 merges; asking for 16,000 returns the same
9,575 (further merges would memorize hapax legomena). Growing the
vocabulary further requires more diverse committed text, not a flag.

    python scripts/train_bpe_merges.py [n_merges]
"""

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from neurostore_text_extraction_spark.functions.bpe import dump_merges, train_bpe

N_MERGES = int(sys.argv[1]) if len(sys.argv) > 1 else 16000
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
for p in sorted(
    glob.glob(
        os.path.join(
            REPO,
            "neurostore_text_extraction_spark",
            "resources",
            "langid_seeds",
            "*.txt",
        )
    )
):
    with open(p, encoding="utf-8") as f:
        texts.append(f.read())

merges = train_bpe(texts, N_MERGES)
out = os.path.join(
    REPO, "neurostore_text_extraction_spark", "resources", "bpe_merges.txt"
)
with open(out, "w") as f:
    f.write(
        f"# byte-level BPE merges ({len(merges)}), trained on sf0.001 "
        "documents + tests/goldens + langid seeds by scripts/train_bpe_merges.py "
        "(deterministic)\n"
    )
    f.write(dump_merges(merges) + "\n")
print(f"wrote {len(merges)} merges to {out}")
