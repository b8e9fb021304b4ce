"""Generate the committed golden fixtures (FIXTURES.md §2).

Run once (and only re-run on an intentional semantics change):

    PYTHONPATH=/root/repo python tools/gen_goldens.py

Writes
* spans_expected.jsonl   — per-doc (kind, text, media_ref, order) sequences
* summaries_expected.jsonl — per-doc summary incl. the structured
  ``details_json`` record (the reference's final_result analog)
"""

import json
import pathlib

from deed_ocr_spark.corpus import doc_id_for, gen_doc
from deed_ocr_spark.golden import doc_summary, extract_doc

N_DOCS = 120
SEED = 42

golden_dir = pathlib.Path(__file__).parent.parent / "tests" / "golden"
golden_dir.mkdir(parents=True, exist_ok=True)

with open(golden_dir / "spans_expected.jsonl", "w") as f:
    for i in range(N_DOCS):
        doc_id = doc_id_for(i)
        spans = extract_doc(gen_doc(doc_id, SEED)["spans"])
        f.write(json.dumps({"doc_id": doc_id, "spans": spans}) + "\n")

with open(golden_dir / "summaries_expected.jsonl", "w") as f:
    for i in range(N_DOCS):
        doc_id = doc_id_for(i)
        summary = doc_summary(gen_doc(doc_id, SEED)["spans"])
        f.write(json.dumps({"doc_id": doc_id, **summary}) + "\n")

print(f"wrote {N_DOCS} golden docs (spans + summaries) to {golden_dir}")
