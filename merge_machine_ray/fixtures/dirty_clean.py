"""F4 fixture: a seeded synthetic clone of the reference's
``examples/data_1`` shape — a clean referential (UAI-style registry) and
a dirty source citing it, with a certain-match key pair for
auto-labelling (``column_certain_matches.json`` analog).

Column roles mirror ``examples/data_1/ref.csv`` / ``source.csv``
(denomination + locality + departement + key), with a small vocabulary;
the reference CSVs themselves are never copied.
"""

from __future__ import annotations

import random

import pyarrow as pa

from merge_machine_ray.fixtures.pages import (
    _ABBREV,
    _CITIES,
    _DEPTS,
    _NAMES,
    _TYPES,
    SEED,
)

MATCH_COLS = [
    {"source": "etab", "ref": "denomination"},
    {"source": "ville", "ref": "localite"},
    {"source": "dept", "ref": "departement"},
]
CERTAIN_KEY = {"source": "code_uai", "ref": "numero_uai"}


def ref_table(n: int) -> pa.Table:
    rows = []
    for i in range(n):
        rng = random.Random(f"{SEED}:ref:{i}")
        rows.append({
            "numero_uai": f"{1000000 + i:07d}K",
            "denomination": f"{rng.choice(_TYPES)} {rng.choice(_NAMES)}",
            "localite": rng.choice(_CITIES),
            "departement": rng.choice(_DEPTS),
            "code_postal": f"{rng.randint(1000, 95999):05d}",
        })
    return pa.Table.from_pylist(rows)


def _dirty_text(s: str, rng: random.Random) -> str:
    toks = s.split()
    for _ in range(rng.randint(0, 2)):
        op = rng.randint(0, 3)
        if not toks:
            break
        k = rng.randrange(len(toks))
        if op == 0:
            toks[k] = toks[k].upper()
        elif op == 1 and toks[k].lower() in _ABBREV:
            toks[k] = _ABBREV[toks[k].lower()]
        elif op == 2 and len(toks[k]) > 5:
            t = toks[k]
            j = rng.randrange(1, len(t) - 2)
            toks[k] = t[:j] + t[j + 1] + t[j] + t[j + 2:]
        elif op == 3:
            from merge_machine_ray.functions.normalize import TRANSLIT

            toks[k] = "".join(TRANSLIT.get(c, c) for c in toks[k].lower())
    return " ".join(toks)


def source_table(n_ref: int, n_source: int,
                 with_key_fraction: float = 0.6) -> pa.Table:
    """Dirty rows citing a random ref row; ``code_uai`` present for a
    fraction (the auto-label key), '' otherwise. ``_ref_idx`` column
    carries ground truth for tests (dropped before linking)."""
    ref = ref_table(n_ref).to_pylist()
    rows = []
    for i in range(n_source):
        rng = random.Random(f"{SEED}:src:{i}")
        j = rng.randrange(n_ref)
        r = ref[j]
        rows.append({
            "id_row": str(i),
            "etab": _dirty_text(r["denomination"], rng),
            "ville": _dirty_text(r["localite"], rng),
            "dept": r["departement"] if rng.random() < 0.9 else "",
            "code_uai": r["numero_uai"] if rng.random() < with_key_fraction
            else "",
            "_ref_idx": j,
        })
    return pa.Table.from_pylist(rows)
