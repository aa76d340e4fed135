"""Training-corpus cleaning pipeline: the composition a 100 TB text
pipeline actually runs — language ID → quality gates → exact dedup →
MinHash near-dedup — each stage a Ray Data transform, fused by the
streaming executor (nothing materializes between gates except the
near-dup edge list).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from merge_machine_ray.stages.dedup import exact_dedup, minhash_dedup_keep
from merge_machine_ray.stages.textstats import LangId, add_quality_scores


def clean_corpus(ds, text_col: str = "text", id_col: str = "doc_id",
                 keep_langs: tuple[str, ...] | None = None,
                 min_chars: int = 50, max_chars: int = 1_000_000,
                 min_tokens: int = 10, max_punct_ratio: float = 0.2,
                 near_dup_threshold: float = 0.8,
                 near_dup: bool = True):
    """→ cleaned Dataset (surviving rows, original columns +
    lang_pred)."""
    ds = ds.map_batches(LangId(col=text_col), batch_format="pyarrow")

    def quality_gate(t: pa.Table) -> pa.Table:
        t = add_quality_scores(t, col=text_col)
        keep = pc.and_(
            pc.and_(pc.greater_equal(t["n_chars_q"], min_chars),
                    pc.less_equal(t["n_chars_q"], max_chars)),
            pc.and_(pc.greater_equal(t["n_tokens_q"], min_tokens),
                    pc.less_equal(t["punct_ratio"], max_punct_ratio)))
        if keep_langs:
            lang_ok = pc.is_in(t["lang_pred"],
                               value_set=pa.array(list(keep_langs)))
            keep = pc.and_(keep, lang_ok)
        t = t.filter(keep)
        return t.drop_columns(["n_chars_q", "n_tokens_q", "punct_ratio",
                               "digit_ratio", "upper_ratio"])

    ds = ds.map_batches(quality_gate, batch_format="pyarrow")
    ds = exact_dedup(ds, col=text_col, id_col=id_col)
    if near_dup:
        ds = minhash_dedup_keep(ds, col=text_col, id_col=id_col,
                                jaccard_threshold=near_dup_threshold)
    return ds
