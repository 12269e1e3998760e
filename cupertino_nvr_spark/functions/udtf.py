"""Python UDTF surface (SURVEY §2.10): the table-function extension
point, demonstrated with a document chunker whose output is pinned
bit-identical to the pure-codegen ``docs_chunked`` plan.

A UDTF is the escape hatch for ONE-ROW-IN / MANY-ROWS-OUT logic that
can't be said with explode/inline — the registry's own chunker CAN be
(and is) expressed as codegen, which is exactly what makes it the right
demonstration: the same contract computed both ways, hash-compared, so
the extension point is proven without ever being the hot path. Arrow
transfer is enabled (``useArrow``); per-row Python cost remains, which
is why production chunking stays on the codegen plan and the UDTF form
exists for logic that genuinely needs Python (a real tokenizer, a
sentence splitter, a parser).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql.functions import udtf

CHUNK_SCHEMA = (
    "doc_id bigint, chunk_id bigint, chunk_text string, "
    "n_chunk_tokens int, n_doc_tokens int"
)


@udtf(returnType=CHUNK_SCHEMA, useArrow=True)
class ChunkDocs:
    """Overlapping token windows (size 32, stride 24), the docs_chunked
    contract: whitespace tokens of the trimmed text (an all-whitespace
    doc yields the single empty token, matching split-regex semantics),
    one output row per window start."""

    SIZE = 32
    STRIDE = 24

    def eval(self, doc_id: int, text: str):  # noqa: A002 - UDTF signature
        if text is None:
            # the codegen plan's NULL semantics, verified empirically:
            # chunk_spans still emits start 0, slice/array_join/size of a
            # NULL array are NULL, and least() SKIPS the NULL size — the
            # pin must hold on corpora containing NULL text too
            yield (doc_id, 0, None, self.SIZE, None)
            return
        toks = re.split(r"\s+", text.strip())
        n = len(toks)
        for start in range(0, max(n, 1), self.STRIDE):
            chunk = toks[start : start + self.SIZE]
            yield (
                doc_id,
                start // self.STRIDE,
                " ".join(chunk),
                min(self.SIZE, n - start),
                n,
            )


def chunk_docs_udtf(docs: DataFrame) -> DataFrame:
    """Apply the chunker laterally to a (doc_id, text) frame."""
    spark = docs.sparkSession
    spark.udtf.register("chunk_docs", ChunkDocs)
    docs.select("doc_id", "text").createOrReplaceTempView("_chunk_docs_in")
    return spark.sql(
        "SELECT c.* FROM _chunk_docs_in, LATERAL chunk_docs(doc_id, text) c"
    )
