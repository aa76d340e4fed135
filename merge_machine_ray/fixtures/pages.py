"""Deterministic synthetic Common-Crawl-style pages corpus (FIXTURES.md F1-F3).

Plays the role of the reference's conformance corpus
(``examples/data_1/source.csv`` + ``ref.csv`` + the auto-label key join,
``merge_machine/es_labeller.py:1572-1661``): planted entities, 1-6 page
variants each, perturbations mirroring the reference's analyzer axes
(``analyzers/no_resource_analyzer_definitions.py``): accent/case
(special_keyword), abbreviation swaps (french_estab synonyms), typos
(n_grams), leading-zero integers (integers), plus url host/path noise
for Jaro-Winkler.

Everything is keyed off ``(SEED, entity_index)`` so generation is
order-independent and identical across processes / Ray workers.
"""

from __future__ import annotations

import html as _html
import random

import pyarrow as pa

SEED = 42

_TYPES = ["lycée général", "lycée professionnel", "collège", "école élémentaire",
          "université", "institut", "association", "centre de formation"]
_NAMES = ["victor hugo", "émile zola", "jeanne d'arc", "marie curie", "blaise pascal",
          "rené descartes", "louis pasteur", "jules ferry", "george sand",
          "simone veil", "léon blum", "jean moulin", "albert camus", "andré malraux",
          "françois rabelais", "pierre corneille", "molière", "voltaire",
          "jean jaurès", "claude monet", "auguste renoir", "hélène boucher",
          "camille claudel", "olympe de gouges"]
_CITIES = ["paris", "lyon", "marseille", "toulouse", "bordeaux", "nantes", "lille",
           "strasbourg", "rennes", "montpellier", "nancy", "dijon", "angers",
           "grenoble", "orléans", "besançon", "poitiers", "limoges", "amiens",
           "reims", "caen", "rouen", "metz", "brest", "tours", "clermont-ferrand"]
_DEPTS = ["ain", "aisne", "allier", "ardèche", "aube", "aude", "aveyron", "calvados",
          "cantal", "charente", "cher", "corrèze", "côte-d'or", "creuse", "dordogne",
          "doubs", "drôme", "eure", "finistère", "gard", "gers", "gironde", "hérault",
          "indre", "isère", "jura", "landes", "loire", "lot", "lozère", "manche",
          "marne", "mayenne", "morbihan", "moselle", "nièvre", "oise", "orne",
          "sarthe", "savoie", "somme", "var", "vaucluse", "vendée", "vienne",
          "vosges", "yonne"]
_HOSTS = ["annuaire-education.fr", "etablissements-scolaires.fr", "data.gouv.example",
          "onisep.example.org", "education.example.com", "lannuaire.example.fr",
          "scolarite.example.net", "pages-ecoles.example.fr"]
_ABBREV = {"lycée": "lyc", "collège": "clg", "école": "ec", "université": "univ",
           "association": "assoc", "institut": "iut", "saint": "st",
           "général": "gal", "professionnel": "pro"}
_EPOCH_US = 1_577_836_800_000_000  # 2020-01-01T00:00:00Z in microseconds


def _slug(s: str) -> str:
    from merge_machine_ray.functions.normalize import normalize_text

    return normalize_text(s).replace(" ", "-").replace("'", "")


def canonical_entity(i: int) -> dict:
    rng = random.Random(f"{SEED}:entity:{i}")
    etype = rng.choice(_TYPES)
    name = rng.choice(_NAMES)
    city = rng.choice(_CITIES)
    dept = rng.choice(_DEPTS)
    code = rng.randint(1, 99999)
    uai = rng.randint(1000000, 9999999)
    text = (f"{etype} {name} situé à {city} département {dept} "
            f"code postal {code:05d} identifiant {uai} "
            f"contact secrétariat de l'établissement {name} {city}")
    return {"entity_id": i, "etype": etype, "name": name, "city": city,
            "dept": dept, "code": code, "uai": uai, "text": text}


def _perturb(text: str, rng: random.Random) -> str:
    """Apply 0-3 analyzer-axis perturbations; keeps the page clearly the
    same entity (the scorer must still clear the match threshold)."""
    toks = text.split()
    n_ops = rng.randint(0, 3)
    for _ in range(n_ops):
        op = rng.randint(0, 4)
        if op == 0 and toks:  # case change
            k = rng.randrange(len(toks))
            toks[k] = toks[k].upper() if rng.random() < 0.5 else toks[k].capitalize()
        elif op == 1 and toks:  # abbreviation swap
            for k, t in enumerate(toks):
                if t.lower() in _ABBREV and rng.random() < 0.8:
                    toks[k] = _ABBREV[t.lower()]
                    break
        elif op == 2 and len(toks) > 8:  # drop a non-informative token
            k = rng.randrange(len(toks))
            if toks[k].lower() in {"de", "à", "situé", "contact", "l'établissement"}:
                del toks[k]
        elif op == 3 and toks:  # typo: swap adjacent chars in a long token
            k = rng.randrange(len(toks))
            t = toks[k]
            if len(t) > 5:
                j = rng.randrange(1, len(t) - 2)
                toks[k] = t[:j] + t[j + 1] + t[j] + t[j + 2:]
        elif op == 4 and toks:  # accent strip on one token
            from merge_machine_ray.functions.normalize import TRANSLIT

            k = rng.randrange(len(toks))
            toks[k] = "".join(TRANSLIT.get(c, c) for c in toks[k].lower())
    return " ".join(toks)


def _render_html(text: str, rng: random.Random) -> tuple[bytes, str]:
    """Wrap `text` in boilerplate HTML such that
    ``extract_text_from_html(html) == collapse_ws(text)`` exactly."""
    toks = text.split()
    cut = rng.randint(1, max(1, len(toks) - 1)) if len(toks) > 1 else len(toks)
    head, body = " ".join(toks[:cut]), " ".join(toks[cut:])

    def esc(s: str) -> str:
        s = _html.escape(s)
        if rng.random() < 0.5:
            s = s.replace("é", "&eacute;").replace("è", "&egrave;")
        return s

    doc = (
        "<html><head>"
        f"<script type=\"text/javascript\">var ga={rng.randint(0, 1 << 30)};</script>"
        "<style>body{margin:0;padding:0}</style>"
        f"<!-- crawl-id {rng.randint(0, 1 << 40)} -->"
        "<meta charset=\"utf-8\"/></head>"
        f"<body><h1 class=\"title\">{esc(head)}</h1>"
        + (f"<p id=\"c\">{esc(body)}</p>" if body else "")
        + "</body></html>"
    )
    expected = " ".join(text.split())
    return doc.encode("utf-8"), expected


def entity_pages(i: int) -> list[dict]:
    """All page rows for entity i (1-6 variants)."""
    ent = canonical_entity(i)
    rng = random.Random(f"{SEED}:pages:{i}")
    n_pages = rng.randint(1, 6)
    rows = []
    for v in range(n_pages):
        vrng = random.Random(f"{SEED}:variant:{i}:{v}")
        text = ent["text"] if v == 0 else _perturb(ent["text"], vrng)
        host = vrng.choice(_HOSTS)
        path = _slug(f"{ent['etype']} {ent['name']}")
        if vrng.random() < 0.3:  # path noise (Jaro-Winkler axis)
            path = path.replace("-", "_")
        url = f"https://{host}/{path}/{ent['uai']}-{v}"
        html_bytes, expected = _render_html(text, vrng)
        rows.append({
            "url": url,
            "warc_ts": _EPOCH_US + (i * 6 + v) * 60_000_000,
            "html": html_bytes,
            "text": expected,
            "lang": "fr" if vrng.random() < 0.9 else "en",
            "entity_id": i,  # stripped from the pages table, kept for F3
        })
    return rows


PAGES_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("html", pa.binary()),
    ("text", pa.string()),
    ("lang", pa.string()),
])


def pages_table(lo: int, hi: int, with_entity: bool = False) -> pa.Table:
    """Arrow table of pages for entities [lo, hi) — safe to call from
    parallel Ray tasks (generation is keyed per entity)."""
    rows: list[dict] = []
    for i in range(lo, hi):
        rows.extend(entity_pages(i))
    cols = {
        "url": pa.array([r["url"] for r in rows], pa.string()),
        "warc_ts": pa.array([r["warc_ts"] for r in rows], pa.timestamp("us")),
        "html": pa.array([r["html"] for r in rows], pa.binary()),
        "text": pa.array([r["text"] for r in rows], pa.string()),
        "lang": pa.array([r["lang"] for r in rows], pa.string()),
    }
    if with_entity:
        cols["entity_id"] = pa.array([r["entity_id"] for r in rows], pa.int64())
    return pa.table(cols)


def entities_table(n_entities: int) -> pa.Table:
    """F3: url → planted entity_id (oracle clustering truth)."""
    t = pages_table(0, n_entities, with_entity=True)
    return t.select(["url", "entity_id"])


def write_fixture(out_dir: str, n_entities: int, shard_size: int = 2000) -> None:
    """Write the pages fixture as partitioned parquet (one file per
    entity shard → resumable/verifiable layout)."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    for lo in range(0, n_entities, shard_size):
        hi = min(lo + shard_size, n_entities)
        part = os.path.join(out_dir, f"pages-{lo:08d}.parquet")
        if os.path.exists(part):
            continue
        pq.write_table(pages_table(lo, hi), part, row_group_size=10000)
