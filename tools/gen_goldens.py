"""Generate the committed golden span-sequence fixtures (FIXTURES.md §2).

Run once (and only re-run on an intentional semantics change):

    python tools/gen_goldens.py
"""

import json
import pathlib

from deed_ocr_spark.corpus import doc_id_for, gen_doc
from deed_ocr_spark.golden import extract_doc

N_DOCS = 120
SEED = 42

out_path = pathlib.Path(__file__).parent.parent / "tests" / "golden" / "spans_expected.jsonl"
out_path.parent.mkdir(parents=True, exist_ok=True)

with open(out_path, "w") as f:
    for i in range(N_DOCS):
        doc_id = doc_id_for(i)
        spans = extract_doc(gen_doc(doc_id, SEED)["spans"])
        f.write(json.dumps({"doc_id": doc_id, "spans": spans}) + "\n")

print(f"wrote {N_DOCS} golden docs to {out_path}")
