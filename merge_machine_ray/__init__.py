"""merge_machine_ray — Ray-Data-native record-linkage & training-data
engine (see README.md; reference capability map in COVERAGE.md)."""

__version__ = "0.1.0"

__all__ = [
    "resolve_entities",
    "score_candidate_pairs",
    "resolve_entities_resumable",
    "link_datasets",
    "LinkParams",
    "MatchParams",
    "clean_corpus",
]


def __getattr__(name):  # lazy imports keep `import merge_machine_ray` cheap
    if name in ("resolve_entities", "score_candidate_pairs"):
        from merge_machine_ray.pipelines import entity_resolution as m

        return getattr(m, name)
    if name == "resolve_entities_resumable":
        from merge_machine_ray.pipelines.resumable import (
            resolve_entities_resumable,
        )

        return resolve_entities_resumable
    if name in ("link_datasets", "LinkParams"):
        from merge_machine_ray.pipelines import linking as m

        return getattr(m, name)
    if name == "MatchParams":
        from merge_machine_ray.state.params import MatchParams

        return MatchParams
    if name == "clean_corpus":
        from merge_machine_ray.pipelines.corpus_cleaning import clean_corpus

        return clean_corpus
    raise AttributeError(name)
