"""Sequential single-process oracle (FIXTURES.md "Determinism rules").

Implements the exact extract → block → score → cluster semantics of the
Ray pipeline in plain Python over a pyarrow Table, reusing the SAME
pure functions (functions/*). The pipeline tests assert that the
distributed orchestration (map_batches batching, band-key shuffles,
feature joins, distributed connected components) changes nothing:
byte-identical normalized text per url, identical candidate-pair sets,
identical match decisions, identical cluster partitions.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import numpy as np
import pyarrow as pa

from merge_machine_ray.functions.hashing import crc_hash64, stable_hash64
from merge_machine_ray.functions.minhash import minhash_signature, token_shingles
from merge_machine_ray.functions.normalize import (
    extract_text_from_html,
    normalize_text,
    url_host,
)
from merge_machine_ray.functions.similarity import jaro_winkler
from merge_machine_ray.functions.tokenize import ANALYZERS
from merge_machine_ray.state.params import MatchParams

_MASK63 = (1 << 63) - 1


def _to_i64(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


class OracleDoc:
    __slots__ = ("url", "doc_id", "host", "path", "lang", "norm_text",
                 "tok_hashes", "int_hashes")


def featurize_rows(table: pa.Table, params: MatchParams,
                   id_col: str = "url", text_col: str = "text") -> list[OracleDoc]:
    tokenize = ANALYZERS[params.analyzer]
    docs = []
    names = set(table.column_names)
    for row in table.to_pylist():
        d = OracleDoc()
        if "html" in names:
            text = extract_text_from_html(row["html"])
        else:
            text = row[text_col]
        d.norm_text = normalize_text(text)
        if id_col == "url":
            d.url = row["url"]
            d.doc_id = _to_i64(stable_hash64(row["url"]))
            d.host = url_host(row["url"])
            i = d.url.find(d.host) if d.host else -1
            d.path = (d.url[i + len(d.host):] if i >= 0 else d.url)[:24]
        else:
            d.url = ""  # no url features for id-keyed tables
            d.doc_id = int(row[id_col])
            d.host = ""
            d.path = ""
        d.lang = row.get("lang", "")
        from merge_machine_ray.stages.normalize_stage import tok31

        d.tok_hashes = [tok31(crc_hash64(t)) for t in tokenize(d.norm_text)]
        d.int_hashes = sorted({tok31(crc_hash64(t))
                               for t in ANALYZERS["integers"](d.norm_text)})
        docs.append(d)
    return docs


def band_keys_for(doc: OracleDoc, params: MatchParams, include_host: bool) -> list[int]:
    from merge_machine_ray.stages.blocking import band_hashes_for

    return band_hashes_for(doc.tok_hashes, doc.host if include_host else "",
                           params.num_perm, params.num_bands,
                           params.shingle_width)


def candidate_pairs_oracle(docs: list[OracleDoc], params: MatchParams,
                           include_host: bool = True) -> set[tuple[int, int]]:
    """Mirrors blocking.candidate_pairs (light mode): all pairs sharing
    ≥1 band key, set-deduplicated; oversized blocks emit the star+chain
    pattern."""
    bands_by_doc = {d.doc_id: band_keys_for(d, params, include_host)
                    for d in docs}
    blocks: dict[int, set[int]] = defaultdict(set)
    for d in docs:
        for k in bands_by_doc[d.doc_id]:
            blocks[k].add(d.doc_id)
    pairs: set[tuple[int, int]] = set()
    for members in blocks.values():
        ms = sorted(members)
        n = len(ms)
        if n < 2:
            continue
        if n <= params.block_cap:
            for i in range(n - 1):
                for j in range(i + 1, n):
                    pairs.add((ms[i], ms[j]))
        else:
            m = ms[0]
            for i in range(1, n):
                pairs.add((m, ms[i]))
                if i + 1 < n:
                    pairs.add((ms[i], ms[i + 1]))
    return pairs


def build_idf(docs: list[OracleDoc], min_df: int = 2) -> dict:
    df: Counter = Counter()
    for d in docs:
        df.update(set(d.tok_hashes))
    n = len(docs)
    items = sorted((t, c) for t, c in df.items() if c >= min_df)
    keys = np.array([t for t, _ in items], dtype=np.int64)
    vals = np.array([math.log((n + 1) / (c + 1)) + 1 for _, c in items])
    return {"keys": keys, "vals": vals,
            "default": math.log((n + 1) / 2.0) + 1.0, "n_docs": n}


def score_pair(da: OracleDoc, db: OracleDoc, idf: dict, params: MatchParams) -> float:
    def w(doc):
        tf = Counter(doc.tok_hashes)
        out = {}
        for h, c in tf.items():
            i = np.searchsorted(idf["keys"], h)
            v = idf["vals"][i] if i < idf["keys"].size and idf["keys"][i] == h \
                else idf["default"]
            out[h] = c * v
        return out, math.sqrt(sum(v * v for v in out.values()))

    wa, na = w(da)
    wb, nb = w(db)
    sim_text = 0.0
    if na > 0 and nb > 0:
        dot = sum(v * wb[h] for h, v in wa.items() if h in wb)
        sim_text = dot / (na * nb)
    sa, sb = set(da.int_hashes), set(db.int_hashes)
    sim_ints = (len(sa & sb) / (len(sa) + len(sb) - len(sa & sb))
                if sa and sb else 0.0)
    sim_host = jaro_winkler(da.host, db.host) if (da.host and db.host) else 0.0
    sim_url = jaro_winkler(da.path, db.path) if (da.path and db.path) else 0.0
    sim_lang = 1.0 if (da.lang == db.lang and da.lang) else 0.0
    return (params.w_text * sim_text + params.w_ints * sim_ints
            + params.w_host * sim_host
            + params.w_url * sim_url + params.w_lang * sim_lang)


def resolve_oracle(table: pa.Table, params: MatchParams | None = None,
                   id_col: str = "url", text_col: str = "text") -> dict[int, int]:
    """Full sequential ER: doc_id → cluster_id (component min)."""
    params = MatchParams.from_any(params)
    docs = featurize_rows(table, params, id_col=id_col, text_col=text_col)
    by_id = {d.doc_id: d for d in docs}
    pairs = candidate_pairs_oracle(docs, params, include_host=(id_col == "url"))
    idf = build_idf(docs)
    from merge_machine_ray.stages.clustering import UnionFind

    uf = UnionFind()
    for a, b in pairs:
        if score_pair(by_id[a], by_id[b], idf, params) >= params.threshold:
            uf.union(a, b)
    return {d.doc_id: uf.find(d.doc_id) for d in docs}
