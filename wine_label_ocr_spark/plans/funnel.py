"""One-pass training-data funnel with observed stage counters.

The gate query ``training_funnel`` counts stages via five union branches
(re-executing shared subtrees — fine at gate scale). This module is the
production form: ``Observation`` metrics attached at every stage boundary
of ONE composed plan, so a single job both materializes the final chunks
and reports per-stage survivor counts — at 100 TB the difference between
one scan and five.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, functions as F

from ..operators.dedupe import exact_dedup
from ..operators.textops import chunk_documents, quality_gate


def run_funnel_one_pass(docs: DataFrame, lang: str = "en",
                        chunk_tokens: int = 64, overlap: int = 8,
                        sink: str = "noop") -> dict[str, int]:
    """corpus → quality → lang → exact-dedup → chunks in ONE job.

    Returns per-stage counts observed during that single execution.
    ``sink='noop'`` forces materialization without output; pass a path to
    also persist the chunks as parquet.
    """
    obs = {name: Observation(name)
           for name in ("corpus", "quality", "lang", "deduped")}
    plan = docs.observe(obs["corpus"], F.count(F.lit(1)).alias("n"))
    plan = (plan.filter(quality_gate(F.col("text")))
            .observe(obs["quality"], F.count(F.lit(1)).alias("n")))
    plan = (plan.filter(F.col("lang") == lang)
            .observe(obs["lang"], F.count(F.lit(1)).alias("n")))
    plan = exact_dedup(plan).observe(obs["deduped"],
                                     F.count(F.lit(1)).alias("n"))
    chunks = chunk_documents(plan, chunk_tokens=chunk_tokens, overlap=overlap)
    chunks_obs = Observation("chunks")
    chunks = chunks.observe(chunks_obs, F.count(F.lit(1)).alias("n"))
    if sink == "noop":
        chunks.write.format("noop").mode("overwrite").save()
    else:
        chunks.write.mode("overwrite").parquet(sink)
    out = {name: int(o.get["n"]) for name, o in obs.items()}
    out["chunks"] = int(chunks_obs.get["n"])
    return out
