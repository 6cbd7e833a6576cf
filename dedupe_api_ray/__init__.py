"""dedupe_api_ray — a Ray-Data-native record-linkage / deduplication engine.

From-scratch reimplementation of the data-processing core of
``fgregg/dedupe-api`` (predicate-based blocking → logistic-regression
pairwise scoring over string-distance features → transitive-closure +
hierarchical clustering), re-expressed Ray-Data-first:

- every table is a ``ray.data.Dataset`` whose blocks are Arrow tables,
- per-record transforms are vectorized ``map_batches`` stages,
- stateful stages (pair scorer, TF-IDF canopy index, gazetteer index)
  are actor pools,
- wide steps (blocking self-join, pair distinct, connected components,
  per-component clustering) are ``groupby``/``map_groups`` shuffles with
  explicit hot-key salting.

The Flask/Postgres/Redis serving layer of the reference is out of scope
(BASELINE.json north_star); the engine mirrors the programmatic
``dedupe`` library flow: ``train(...) -> Model`` driver-side, then
``partition(ds, model, threshold) -> Dataset[entity_map]`` distributed.

NOTE on citations: ``/root/reference`` was empty at survey time
(SURVEY.md §0), so reference citations in docstrings use the public
``repo:path::symbol`` form reconstructed from public knowledge of
fgregg/dedupe-api and the dedupe library, marked with a dagger (†).
"""

from dedupe_api_ray.model import DataModel, FieldDef, Model, train_model
from dedupe_api_ray.pipelines.dedupe import partition

__version__ = "0.1.0"

__all__ = [
    "DataModel",
    "FieldDef",
    "Model",
    "train_model",
    "partition",
]
