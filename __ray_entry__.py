"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship dedupe partition pipeline over
/root/testdata/sf0.001 documents; ``queries()`` exposes one callable
per implemented operator family (SURVEY.md §2 + the training-data
extras); ``oracle_sql()`` gives the DuckDB-equivalent SQL for every
SQL-expressible query (same column names, rounded floats) so the
driver's row-count/schema/value-hash comparison is exact.

Ray is initialised by the driver BEFORE import: nothing here calls
ray.init()/ray.shutdown().
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from dedupe_api_ray.functions.text import TOKEN_PATTERN_SQL, TOKEN_RE
from dedupe_api_ray.model import FieldDef, Model, PredicateSpec

# ---------------------------------------------------------------------------
# shared helpers
# ---------------------------------------------------------------------------

_NORM_SQL = "nullif(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), '')"
_TOK_PATTERN_SQL_ESC = TOKEN_PATTERN_SQL.replace("'", "''")
_TOK_SQL = f"regexp_extract_all(lower(text), '{_TOK_PATTERN_SQL_ESC}')"



def _r(arr, nd: int = 6):
    """pc.round with ties AWAY from zero — pc.round's default is
    banker's (half_to_even) while DuckDB round() (every oracle) is
    half-away-from-zero; an exact binary half at the target digit
    (e.g. a ratio with a power-of-two denominator) would flip a digit
    and break the hash compare."""
    return pc.round(arr, nd, round_mode="half_towards_infinity")

# ---------------------------------------------------------------------------
# Flagship-chain SQL templates (oracle for pipelines/dedupe.py).
#
# The whole partition() pipeline — normalize → exact-collapse →
# firstToken blocking → TF-cosine + exact-source scoring → threshold →
# connected components → per-component Lance-Williams centroid-linkage
# REPLAY with the fcluster-style maxh cut — is expressed as one CTE
# chain, parameterized by (source relation, CTE-name prefix) so
# dedupe_canon can instantiate it twice (documents pass + canon pass)
# in a single statement.  Float parity notes:
# - scores: computed in DOUBLE, cast to REAL like the engine's float32
#   store, so ulp noise cannot flip a rounded digit;
# - linkage: the Lance-Williams update is written with the engine's
#   exact operand grouping ((sa*dak + sb*dbk)/(sa+sb) - sa*sb*dmin/
#   ((sa+sb)*(sa+sb))); +/* are commutative in IEEE so slot order is
#   irrelevant, and ties break on (a, b) node ids exactly like
#   stages/clustering.py::centroid_linkage_np's lexsort;
# - the replay assumes no component exceeds max_cluster_size=1000
#   (the engine's transitive-closure fallback), true at oracle scales.
# ---------------------------------------------------------------------------


def _dedupe_chain_ctes(src: str, p: str = "") -> str:
    """CTE list for the chain up to scored pairs ``{p}sc``:
    mirrors partition() stages over ``src`` (doc_id, text, source)."""
    return f"""{p}norm AS (
  SELECT doc_id, {_NORM_SQL} AS tnorm, source FROM {src}
), {p}repmap AS MATERIALIZED (
  SELECT doc_id, min(doc_id) OVER (PARTITION BY tnorm, source) AS rid
  FROM {p}norm
), {p}rdocs AS (
  SELECT n.doc_id AS rid, n.tnorm, n.source
  FROM {p}norm n JOIN (SELECT DISTINCT rid FROM {p}repmap) r
    ON n.doc_id = r.rid
), {p}tf AS (
  SELECT rid, tok, count(*)::DOUBLE AS f
  FROM (SELECT rid,
               unnest(regexp_extract_all(tnorm, '{_TOK_PATTERN_SQL_ESC}'))
                 AS tok
        FROM {p}rdocs)
  GROUP BY rid, tok
), {p}nrm AS (
  SELECT rid, sqrt(sum(f * f)) AS nn FROM {p}tf GROUP BY rid
), {p}bm AS (
  SELECT rid, source, regexp_extract(tnorm, '{_TOK_PATTERN_SQL_ESC}') AS ft
  FROM {p}rdocs WHERE regexp_extract(tnorm, '{_TOK_PATTERN_SQL_ESC}') <> ''
), {p}prs AS (
  SELECT a.rid AS id_a, b.rid AS id_b,
         CASE WHEN a.source = b.source THEN 1.0 ELSE 0.0 END AS eq
  FROM {p}bm a JOIN {p}bm b ON a.ft = b.ft AND a.rid < b.rid
), {p}dots AS (
  SELECT p.id_a, p.id_b, sum(ta.f * tb.f) AS dot
  FROM {p}prs p
  JOIN {p}tf ta ON ta.rid = p.id_a
  JOIN {p}tf tb ON tb.rid = p.id_b AND tb.tok = ta.tok
  GROUP BY p.id_a, p.id_b
), {p}sc AS MATERIALIZED (
  SELECT p.id_a, p.id_b,
         CAST(1.0 / (1.0 + exp(-(10.0 *
             LEAST(coalesce(d.dot, 0.0) / (na.nn * nb.nn), 1.0)
             + 1.0 * p.eq - 8.0))) AS REAL) AS s32
  FROM {p}prs p
  LEFT JOIN {p}dots d ON d.id_a = p.id_a AND d.id_b = p.id_b
  JOIN {p}nrm na ON na.rid = p.id_a
  JOIN {p}nrm nb ON nb.rid = p.id_b
)"""


def _components_ctes(p: str = "") -> str:
    """Threshold-kept edges → connected components ``{p}complbl``
    (rid → component_id = min rid) via the recursive min-label walk."""
    return f"""{p}e0 AS (SELECT id_a AS u, id_b AS v FROM {p}sc WHERE s32 >= 0.5),
{p}edges AS (SELECT u, v FROM {p}e0 UNION SELECT v, u FROM {p}e0),
{p}walk(node, lbl) AS (
  SELECT rid, rid FROM {p}rdocs
  UNION
  SELECT e.v, w.lbl FROM {p}walk w JOIN {p}edges e ON e.u = w.node
  WHERE w.lbl < e.v
), {p}complbl AS MATERIALIZED (
  SELECT node AS rid, min(lbl) AS component_id FROM {p}walk GROUP BY node
)"""


def _replay_ctes(p: str = "") -> str:
    """Per-component centroid-linkage replay + maxh<=0.5 cut →
    ``{p}em`` (record_id → flat cluster_id for EVERY source record,
    dupes rejoining through their collapse rep).  Exact mirror of
    stages/clustering.py::centroid_linkage_np + cut_tree_np: one merge
    per component per recursion step (global-min distance, ties to the
    smallest (lo, hi) node-id pair), Lance-Williams distance update,
    flat clusters = leaves under the topmost merge whose running max
    link height stays <= 1 - threshold."""
    return f"""{p}kept AS MATERIALIZED (
  SELECT id_a, id_b, CAST(s32 AS DOUBLE) AS s FROM {p}sc WHERE s32 >= 0.5
), {p}leaves AS MATERIALIZED (
  SELECT component_id AS comp, rid,
         row_number() OVER (PARTITION BY component_id ORDER BY rid) - 1
           AS leaf
  FROM {p}complbl
), {p}csize AS MATERIALIZED (
  SELECT comp, count(*) AS n FROM {p}leaves GROUP BY comp
), {p}d0 AS MATERIALIZED (
  SELECT a.comp, a.leaf AS ka, b.leaf AS kb,
         coalesce((1.0 - k.s) * (1.0 - k.s), 1.0) AS d2
  FROM {p}leaves a JOIN {p}leaves b
    ON a.comp = b.comp AND a.leaf < b.leaf
  LEFT JOIN {p}kept k ON k.id_a = a.rid AND k.id_b = b.rid
), {p}lw(tag, comp, a, b, d2, node, size, maxh) AS (
  SELECT * FROM (
    SELECT 'd' AS tag, comp, ka AS a, kb AS b, d2,
           CAST(NULL AS BIGINT) AS node, CAST(NULL AS BIGINT) AS size,
           CAST(NULL AS DOUBLE) AS maxh
    FROM {p}d0
    UNION ALL
    SELECT 'c', comp, NULL, NULL, NULL, leaf, 1, 0.0 FROM {p}leaves
  )
  UNION ALL
  SELECT r.* FROM (
    WITH prev AS (SELECT * FROM {p}lw),
    dprev AS (SELECT comp, a, b, d2 FROM prev WHERE tag = 'd'),
    cprev AS (SELECT comp, node, size, maxh FROM prev WHERE tag = 'c'),
    pick AS (
      SELECT comp, a, b, d2 FROM (
        SELECT comp, a, b, d2,
               row_number() OVER (PARTITION BY comp ORDER BY d2, a, b)
                 AS rn
        FROM dprev) t WHERE rn = 1
    ), stats AS (SELECT comp, count(*) AS cnt FROM cprev GROUP BY comp),
    mg AS (
      SELECT pk.comp, pk.a, pk.b, pk.d2, 2 * s.n - st.cnt AS node,
             ca.size AS sa, cb.size AS sb,
             greatest(sqrt(pk.d2), ca.maxh, cb.maxh) AS mh
      FROM pick pk
      JOIN {p}csize s ON s.comp = pk.comp
      JOIN stats st ON st.comp = pk.comp
      JOIN cprev ca ON ca.comp = pk.comp AND ca.node = pk.a
      JOIN cprev cb ON cb.comp = pk.comp AND cb.node = pk.b
    )
    SELECT 'd' AS tag, d.comp, d.a, d.b, d.d2,
           CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
           CAST(NULL AS DOUBLE)
    FROM dprev d JOIN mg ON mg.comp = d.comp
    WHERE d.a <> mg.a AND d.a <> mg.b AND d.b <> mg.a AND d.b <> mg.b
    UNION ALL
    SELECT 'd', mg.comp, k.node, mg.node,
           (mg.sa * dak.d2 + mg.sb * dbk.d2) / (mg.sa + mg.sb)
           - mg.sa * mg.sb * mg.d2 / ((mg.sa + mg.sb) * (mg.sa + mg.sb)),
           NULL, NULL, NULL
    FROM mg
    JOIN cprev k ON k.comp = mg.comp AND k.node <> mg.a AND k.node <> mg.b
    JOIN dprev dak ON dak.comp = mg.comp
         AND dak.a = least(k.node, mg.a) AND dak.b = greatest(k.node, mg.a)
    JOIN dprev dbk ON dbk.comp = mg.comp
         AND dbk.a = least(k.node, mg.b) AND dbk.b = greatest(k.node, mg.b)
    UNION ALL
    SELECT 'c', c.comp, NULL, NULL, NULL, c.node, c.size, c.maxh
    FROM cprev c JOIN mg ON mg.comp = c.comp
    WHERE c.node <> mg.a AND c.node <> mg.b
    UNION ALL
    SELECT 'c', comp, NULL, NULL, NULL, node, sa + sb, mh FROM mg
    UNION ALL
    SELECT 'h', comp, a, b, d2, node, NULL, mh FROM mg
  ) r
), {p}hist AS (
  SELECT comp, a, b, node AS parent, maxh FROM {p}lw WHERE tag = 'h'
), {p}up(comp, rid, node) AS (
  SELECT comp, rid, leaf FROM {p}leaves
  UNION ALL
  SELECT u.comp, u.rid, h.parent
  FROM {p}up u JOIN {p}hist h
    ON h.comp = u.comp AND (h.a = u.node OR h.b = u.node)
  WHERE h.maxh <= 0.5
), {p}topg AS (
  SELECT comp, rid, max(node) AS gnode FROM {p}up GROUP BY comp, rid
), {p}flatc AS (
  SELECT comp, rid, min(rid) OVER (PARTITION BY comp, gnode) AS cluster_id
  FROM {p}topg
), {p}em AS MATERIALIZED (
  SELECT m.doc_id AS record_id, f.cluster_id
  FROM {p}repmap m JOIN {p}flatc f ON f.rid = m.rid
)"""


def _canonicalize_ctes(src: str = "documents", p: str = "p1",
                       out: str = "canon_records") -> str:
    """stages/canonicalize.py in SQL over the ``{p}em`` entity map:
    per (cluster, field) the canonical value minimizes the summed
    normalized-affine-gap distance to the other members' values
    (multiplicity included, ties to the earliest record_id).  The
    affine-gap DP runs as the shared recursive ``ag`` CTE (one row per
    (pair, i, j)); every DP quantity is an exact multiple of 1/8 well
    under 2^52, so any IEEE evaluation order gives bit-identical
    results.  Cost sums are exact at oracle scales (clusters of <= 3
    members → <= 2 addends; k*d for k<=2 is exact)."""
    fields = ("text", "source")
    parts = []
    for f in fields:
        parts.append(f"""{p}cv_{f} AS MATERIALIZED (
  SELECT e.cluster_id, e.record_id, d.{f} AS v
  FROM {p}em e JOIN {src} d ON d.doc_id = e.record_id
  WHERE d.{f} IS NOT NULL AND d.{f} <> ''
), {p}cc_{f} AS MATERIALIZED (
  SELECT cluster_id, v, min(record_id) AS first_rid, count(*) AS cnt
  FROM {p}cv_{f} GROUP BY cluster_id, v
)""")
    np0 = " UNION ".join(
        f"""SELECT a.v AS va, b.v AS vb FROM {p}cc_{f} a JOIN {p}cc_{f} b
    ON a.cluster_id = b.cluster_id AND a.v < b.v""" for f in fields)
    parts.append(f"""{p}np0 AS (
  {np0}
), {p}agpairs AS MATERIALIZED (
  SELECT row_number() OVER (ORDER BY s1, s2) AS pid, s1, s2,
         length(s1) AS l1, length(s2) AS l2
  FROM (
    SELECT DISTINCT
      CASE WHEN length(ta) >= length(tb) THEN ta ELSE tb END AS s1,
      CASE WHEN length(ta) >= length(tb) THEN tb ELSE ta END AS s2
    FROM (SELECT substr(va, 1, 256) AS ta, substr(vb, 1, 256) AS tb
          FROM {p}np0)
    WHERE ta <> tb
  )
), {p}ag(pid, i, j, v, d) AS (
  SELECT pid, 0::BIGINT, j,
         CAST(CASE WHEN j = 0 THEN 0.0 ELSE 10.0 + 7.0 * j END AS DOUBLE),
         'infinity'::DOUBLE
  FROM (SELECT pid, unnest(range(l1 + 1)) AS j FROM {p}agpairs)
  UNION ALL
  SELECT r.pid, r.i, r.j, r.v, r.d FROM (
    WITH prev AS (SELECT * FROM {p}ag),
    step AS (
      SELECT pr.pid, pr.i + 1 AS i, pr.j, pr.v AS vp, pr.d AS dp,
             lag(pr.v) OVER (PARTITION BY pr.pid ORDER BY pr.j) AS vp1,
             pp.s1, pp.s2, pp.l1, pp.l2
      FROM prev pr JOIN {p}agpairs pp USING (pid)
      WHERE pr.i < pp.l2
    ),
    calc AS (
      SELECT pid, i, j, l1, l2, vp, dp,
        CASE WHEN j = 0 THEN NULL
             ELSE vp1 + CASE WHEN substr(s1, CAST(j AS INT), 1)
                                  = substr(s2, CAST(i AS INT), 1)
                        THEN 1.0 ELSE 11.0 END END AS m,
        CASE WHEN j = 0 THEN 'infinity'::DOUBLE
             ELSE least(dp, vp + 10.0) + 7.0 END AS dn,
        CASE WHEN j = 0 THEN 10.0 + 7.0 * i ELSE NULL END AS v0
      FROM step
    ),
    c2 AS (
      SELECT *, CASE WHEN j = 0 THEN v0 ELSE least(m, dn) END AS bsrc,
        7.0 * least(j, l2) + 0.875 * greatest(0, j - l2) AS sj
      FROM calc
    ),
    c3 AS (
      SELECT *,
        lag(bsrc) OVER (PARTITION BY pid ORDER BY j)
          + CASE WHEN j > l2 THEN 1.25 ELSE 10.0 END
          - lag(sj) OVER (PARTITION BY pid ORDER BY j) AS ck
      FROM c2
    ),
    c4 AS (
      SELECT *, sj + min(ck) OVER (PARTITION BY pid ORDER BY j
                                   ROWS UNBOUNDED PRECEDING) AS ins
      FROM c3
    )
    SELECT pid, i, j,
           CASE WHEN j = 0 THEN v0 ELSE least(least(m, dn), ins) END AS v,
           dn AS d
    FROM c4
  ) r
), {p}nagv AS MATERIALIZED (
  SELECT p2_.s1, p2_.s2, a.v / (p2_.l1 + p2_.l2) AS d
  FROM {p}agpairs p2_ JOIN {p}ag a
    ON a.pid = p2_.pid AND a.i = p2_.l2 AND a.j = p2_.l1
)""")
    for f in fields:
        parts.append(f"""{p}ct_{f} AS (
  SELECT c.cluster_id, c.v, c.first_rid,
         coalesce(sum(o.cnt * CASE
             WHEN substr(c.v, 1, 256) = substr(o.v, 1, 256) THEN 0.5
             ELSE coalesce(n.d, 'NaN'::DOUBLE) END), 0.0) AS cost
  FROM {p}cc_{f} c
  LEFT JOIN {p}cc_{f} o ON o.cluster_id = c.cluster_id AND o.v <> c.v
  LEFT JOIN {p}nagv n
    -- key order must MATCH nagv's canonicalization exactly: longer
    -- string first; equal lengths → lexicographically smaller first
    -- (nagv inherits ta < tb, so its equal-length s1 is the smaller)
    ON n.s1 = CASE WHEN length(substr(c.v, 1, 256))
                        > length(substr(o.v, 1, 256))
                        OR (length(substr(c.v, 1, 256))
                            = length(substr(o.v, 1, 256))
                            AND substr(c.v, 1, 256) < substr(o.v, 1, 256))
              THEN substr(c.v, 1, 256) ELSE substr(o.v, 1, 256) END
   AND n.s2 = CASE WHEN length(substr(c.v, 1, 256))
                        > length(substr(o.v, 1, 256))
                        OR (length(substr(c.v, 1, 256))
                            = length(substr(o.v, 1, 256))
                            AND substr(c.v, 1, 256) < substr(o.v, 1, 256))
              THEN substr(o.v, 1, 256) ELSE substr(c.v, 1, 256) END
  GROUP BY c.cluster_id, c.v, c.first_rid
), {p}canon_{f} AS (
  SELECT cluster_id, v FROM (
    SELECT cluster_id, v,
           row_number() OVER (PARTITION BY cluster_id
                              ORDER BY cost, first_rid) AS rn
    FROM {p}ct_{f}) t WHERE rn = 1
)""")
    parts.append(f"""{out} AS MATERIALIZED (
  SELECT c.cluster_id AS doc_id, t.v AS text, s.v AS source
  FROM (SELECT DISTINCT cluster_id FROM {p}em) c
  LEFT JOIN {p}canon_text t USING (cluster_id)
  LEFT JOIN {p}canon_source s USING (cluster_id)
)""")
    return ",\n".join(parts)


def _docs(sf_dir: str) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet")


def _read(sf_dir: str, table: str, columns=None) -> ray.data.Dataset:
    # Read under a metadata-STRIPPED schema: the files carry pandas
    # schema metadata, which makes pa.Schema unhashable ("unhashable
    # type: 'dict'") and triggers Ray's "Failed to hash the schemas"
    # warning in every block unification downstream (same root cause
    # as stages/blocking.py::local_dedup).  Stripping at the source
    # silences it everywhere at zero cost.
    import pyarrow.parquet as pq
    path = f"{sf_dir}/{table}.parquet"
    full = pq.read_schema(path).remove_metadata()
    schema = pa.schema([full.field(c) for c in columns]) if columns \
        else full
    return ray.data.read_parquet(path, columns=columns, schema=schema)


def documents_model() -> Model:
    """Deterministic hand-pinned model for the `documents` table
    (no labeled pairs exist for driver data, so weights are fixed, not
    trained; the trained path is exercised by tests/ on the synthetic
    corpora).  Features: [text cosine, source exact]."""
    field_defs = [FieldDef("text", "Text"), FieldDef("source", "Exact")]
    predicates = [PredicateSpec("simple", "text", "firstTokenPredicate")]
    # score = sigmoid(10*cosine + 1*source_eq - 8): needs cosine ~0.7+
    return Model(field_defs=field_defs, predicates=predicates,
                 weights=np.array([10.0, 1.0]), bias=-8.0, idf={})


# ---------------------------------------------------------------------------
# entry
# ---------------------------------------------------------------------------


def entry() -> Any:
    """Flagship: full blocking→scoring→clustering partition of the
    sf0.001 documents table (record_id = doc_id)."""
    from dedupe_api_ray.pipelines.dedupe import partition

    docs = _docs("/root/testdata/sf0.001").map_batches(
        lambda t: pa.table({"record_id": t["doc_id"], "text": t["text"],
                            "source": t["source"]}),
        batch_format="pyarrow")
    em = partition(docs, documents_model(), threshold=0.5,
                   scorer_concurrency=(1, 4))
    return em


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def _q_normalize(sf_dir: str):
    from dedupe_api_ray.functions.text import normalize_array

    return _docs(sf_dir).map_batches(
        lambda t: pa.table({"doc_id": t["doc_id"],
                            "text_norm": normalize_array(t["text"])}),
        batch_format="pyarrow")


def _q_token_counts(sf_dir: str):
    def fn(t: pa.Table) -> pa.Table:
        n = [len(TOKEN_RE.findall((x or "").lower()))
             for x in t["text"].to_pylist()]
        return pa.table({"doc_id": t["doc_id"],
                         "n_tokens": pa.array(n, pa.int64())})
    return _docs(sf_dir).map_batches(fn, batch_format="pyarrow")


def _q_doc_quality(sf_dir: str):
    from dedupe_api_ray.extras.textstats import quality_score_batch

    def fn(t: pa.Table) -> pa.Table:
        out = quality_score_batch(t)
        return out.select(["doc_id", "n_tokens", "mean_token_len",
                           "stopword_ratio", "alpha_ratio"])
    return _docs(sf_dir).map_batches(fn, batch_format="pyarrow")


def _q_exact_dedup(sf_dir: str):
    from dedupe_api_ray.extras.dedup import exact_dedup_keep_min

    return exact_dedup_keep_min(_docs(sf_dir))


def _q_blocking_first_token(sf_dir: str):
    def fn(t: pa.Table) -> pa.Table:
        keys, ids = [], []
        for did, x in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            m = TOKEN_RE.search((x or "").lower())
            if m:
                keys.append(m.group(0))
                ids.append(did)
        return pa.table({"block_key": pa.array(keys, pa.string()),
                         "doc_id": pa.array(ids, pa.int64())})
    return _docs(sf_dir).map_batches(fn, batch_format="pyarrow")


def _q_blocking_multi_predicate(sf_dir: str):
    """Union of three predicate families over documents (P3/P11/P16)."""
    import math

    def fn(t: pa.Table) -> pa.Table:
        preds, keys, ids = [], [], []
        for did, x, nc in zip(t["doc_id"].to_pylist(),
                              t["text"].to_pylist(),
                              t["n_chars"].to_pylist()):
            xl = (x or "").lower()
            m = TOKEN_RE.search(xl)
            if m:
                preds.append("firstToken")
                keys.append(m.group(0))
                ids.append(did)
            if xl:
                preds.append("prefix5")
                keys.append(xl[:5])
                ids.append(did)
            if nc and nc > 0:
                preds.append("magnitude")
                keys.append(str(int(round(math.log10(nc)))))
                ids.append(did)
        return pa.table({"pred": pa.array(preds, pa.string()),
                         "block_key": pa.array(keys, pa.string()),
                         "doc_id": pa.array(ids, pa.int64())})
    return _docs(sf_dir).map_batches(fn, batch_format="pyarrow")


def _q_predicate_audit(sf_dir: str):
    """Corpus-scale per-predicate blocking audit (stages/audit.py):
    exact distinct keys / rows / hottest key / Σ C(n,2) pairs per
    candidate predicate — the costs learn_predicates(key_stats=...)
    uses instead of sample estimates."""
    from dedupe_api_ray.model import FieldDef, PredicateSpec
    from dedupe_api_ray.stages.audit import audit_predicates

    specs = [PredicateSpec("simple", "text", "firstTokenPredicate"),
             PredicateSpec("simple", "text", "sameFiveCharStartPredicate"),
             PredicateSpec("simple", "text", "wholeFieldPredicate")]
    return audit_predicates(
        _read(sf_dir, "documents", columns=["doc_id", "text"]),
        specs, [FieldDef("text", "ShortString")], id_col="doc_id")


def _q_candidate_pairs(sf_dir: str):
    from dedupe_api_ray.stages.blocking import candidate_pairs

    bm = _q_blocking_first_token(sf_dir).map_batches(
        lambda t: pa.table({"block_key": t["block_key"],
                            "record_id": t["doc_id"]}),
        batch_format="pyarrow")
    pairs = candidate_pairs(bm, max_block_size=40, hard_cap=10**9)
    return pairs.map_batches(
        lambda t: pa.table({"id_a": t["id_a"], "id_b": t["id_b"]}),
        batch_format="pyarrow")


def _q_latlong_grid(sf_dir: str):
    """P17 latLongGridPredicate through the registry: deterministic
    synthetic (lat, lon) per doc (pure integer-mod arithmetic mirrored
    exactly in the oracle SQL), blocked into 0.1-degree grid cells."""
    from dedupe_api_ray.model import PredicateSpec, _record_keys

    spec = PredicateSpec("simple", "loc", "latLongGridPredicate")

    def fn(t: pa.Table) -> pa.Table:
        out_k, out_i = [], []
        for did in t["doc_id"].to_pylist():
            lat = ((did * 7919) % 18000) / 100.0 - 90.0
            lon = ((did * 104729) % 36000) / 100.0 - 180.0
            for key in _record_keys(spec, {"loc": [lat, lon]}):
                out_k.append(key)
                out_i.append(did)
        return pa.table({"block_key": pa.array(out_k, pa.string()),
                         "doc_id": pa.array(out_i, pa.int64())})

    return _docs(sf_dir).select_columns(["doc_id"]) \
        .map_batches(fn, batch_format="pyarrow")


def _q_df_counts(sf_dir: str):
    def fn(t: pa.Table) -> pa.Table:
        out_tok: list[str] = []
        for x in t["text"].to_pylist():
            out_tok.extend(set(TOKEN_RE.findall((x or "").lower())))
        return pa.table({"token": pa.array(out_tok, pa.string())})
    flat = _docs(sf_dir).map_batches(fn, batch_format="pyarrow")
    counts = flat.groupby("token").count()
    return counts.map_batches(
        lambda t: t.rename_columns(["token", "df"]), batch_format="pyarrow")


def _q_grouped_topk(sf_dir: str):
    def topk(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["n_chars", "doc_id"],
                             ascending=[False, True]).head(3) \
            .reset_index(drop=True)
    return _docs(sf_dir).select_columns(["lang", "doc_id", "n_chars"]) \
        .groupby("lang").map_groups(topk, batch_format="pandas")


def _q_threshold_filter_sort(sf_dir: str):
    """Threshold filter + exact top-100 via stages.topk.global_topk
    (per-block prune, then sort only the pruned remnant — no
    full-corpus sort shuffle)."""
    from dedupe_api_ray.stages.topk import global_topk

    ev = _read(sf_dir, "events", columns=["event_id", "user_id", "value"])
    filt = ev.map_batches(
        lambda t: t.filter(pc.greater_equal(t["value"], 150.0)),
        batch_format="pyarrow")
    return global_topk(filt, ["value", "event_id"], 100,
                       descending=[True, False])


def _q_events_tumbling(sf_dir: str):
    """Tumbling 1-hour windows per user: count + sum(value).
    Partial-aggregated per batch before the groupby shuffle."""
    ev = _read(sf_dir, "events", columns=["user_id", "ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        # Arrow-native partial groupby — no pandas copy per batch
        hour = pc.floor_temporal(t["ts"], unit="hour")
        tbl = pa.table({"user_id": t["user_id"], "hour": hour,
                        "value": t["value"]})
        g = tbl.group_by(["user_id", "hour"]).aggregate(
            [("value", "count", pc.CountOptions(mode="all")),
             ("value", "sum")])
        return pa.table({"user_id": g["user_id"], "hour": g["hour"],
                         "n": g["value_count"],
                         "sum_value": g["value_sum"]})

    partials = ev.map_batches(partial, batch_format="pyarrow")
    from ray.data.aggregate import Sum
    agg = partials.groupby(["user_id", "hour"]).aggregate(
        Sum("n", alias_name="n"), Sum("sum_value", alias_name="sum_value"))
    def finish(t: pa.Table) -> pa.Table:
        cents = pc.cast(_r(pc.multiply(t["sum_value"], 100.0), 0),
                        pa.int64())
        return pa.table({"user_id": t["user_id"], "hour": t["hour"],
                         "n": t["n"], "sum_value_cents": cents})

    return agg.map_batches(finish, batch_format="pyarrow")


def _q_events_sessionize(sf_dir: str):
    """Gap-based sessionization (30-min gap) per user: one row per
    session with count/sum/start/end.  Oracle: lag + windowed
    cumulative break-sum, the standard SQL sessionization."""
    from dedupe_api_ray.extras.sessions import sessionize

    ev = _read(sf_dir, "events",
               columns=["event_id", "ts", "user_id", "value"])
    return sessionize(ev, gap_minutes=30.0)


def _q_events_orders_asof(sf_dir: str):
    """Backward as-of join: each event picks the user's most recent
    high-value order (o_totalprice >= 450000, ~top 5% so a real mix of
    matched and null rows) at-or-before the event time; o_orderkey
    breaks o_orderdate ties deterministically.  Oracle: LEFT JOIN
    LATERAL ... ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 1."""
    from dedupe_api_ray.stages.asof import asof_join

    ev = _read(sf_dir, "events", columns=["event_id", "ts", "user_id"])
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_orderdate",
                            "o_totalprice"]) \
        .map_batches(
            lambda t: t.filter(pc.greater_equal(t["o_totalprice"],
                                                450000.0)),
            batch_format="pyarrow")
    return asof_join(ev, orders, left_on="user_id", right_on="o_custkey",
                     left_ts="ts", right_ts="o_orderdate",
                     right_cols=["o_orderkey", "o_totalprice"],
                     right_tiebreak="o_orderkey")


def _q_events_interval_join(sf_dir: str):
    """Range join: every high-value event (value >= 100) opens a 12h
    attribution window for its user; join each event to every window
    containing it (inclusive ends).  Oracle: plain theta join with
    BETWEEN."""
    from dedupe_api_ray.stages.ranges import interval_join

    ev = _read(sf_dir, "events", columns=["event_id", "ts", "user_id"])

    def windows(t: pa.Table) -> pa.Table:
        keep = t.filter(pc.greater_equal(t["value"], 100.0))
        w_end = pc.add(keep["ts"],
                       pa.scalar(12 * 3600 * 1_000_000, pa.duration("us")))
        return pa.table({"user_id": keep["user_id"],
                         "w_start": keep["ts"], "w_end": w_end,
                         "src_event_id": keep["event_id"],
                         "src_value": keep["value"]})

    win = _read(sf_dir, "events",
                columns=["event_id", "ts", "user_id", "value"]) \
        .map_batches(windows, batch_format="pyarrow")
    return interval_join(ev, win, left_on="user_id", left_ts="ts",
                         right_start="w_start", right_end="w_end",
                         right_cols=["src_event_id", "src_value"])


def _orders_high(sf_dir: str):
    return _read(sf_dir, "orders",
                 columns=["o_custkey", "o_totalprice"]) \
        .map_batches(
            lambda t: t.filter(pc.greater_equal(t["o_totalprice"],
                                                400000.0)),
            batch_format="pyarrow")


def _q_customer_semi_orders(sf_dir: str):
    """Semi join: customers with at least one order >= 400000.
    Oracle: WHERE EXISTS."""
    from dedupe_api_ray.stages.semi import semi_join

    cust = _read(sf_dir, "customer",
                 columns=["c_custkey", "c_name", "c_mktsegment"])
    return semi_join(cust, _orders_high(sf_dir), left_on="c_custkey",
                     right_on="o_custkey")


def _q_customer_anti_orders(sf_dir: str):
    """Anti join: customers with NO order >= 400000.  Oracle:
    WHERE NOT EXISTS."""
    from dedupe_api_ray.stages.semi import anti_join

    cust = _read(sf_dir, "customer",
                 columns=["c_custkey", "c_name", "c_mktsegment"])
    return anti_join(cust, _orders_high(sf_dir), left_on="c_custkey",
                     right_on="o_custkey")


def _q_orders_splits(sf_dir: str):
    """NTILE + PERCENT_RANK window functions (the train/eval-split
    primitive) per customer over orders: ntile(5) by (o_orderdate,
    o_orderkey) and tie-aware percent_rank by o_orderdate alone.
    Oracle: the literal SQL NTILE / PERCENT_RANK window clauses."""
    from dedupe_api_ray.stages.windows import window_over

    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_orderdate"])
    nt = window_over(orders, partition_by="o_custkey",
                     order_by=["o_orderdate", "o_orderkey"],
                     ntile={"split": 5})
    return window_over(nt, partition_by="o_custkey",
                       order_by=["o_orderdate"], percent_rank="pr") \
        .select_columns(["o_orderkey", "o_custkey", "split", "pr"])


def _q_orders_window(sf_dir: str):
    """Per-customer window functions over orders ordered by
    (o_orderdate, o_orderkey): row_number, running price total (exact
    int64 cents — price is converted to cents BEFORE the cumsum so
    engine and SQL sum the same integers), and lag(o_orderkey).
    Oracle: the literal SQL window clause."""
    from dedupe_api_ray.stages.windows import window_over

    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_orderdate",
                            "o_totalprice"])

    def cents(t: pa.Table) -> pa.Table:
        c = pc.cast(_r(pc.multiply(t["o_totalprice"], 100.0), 0),
                    pa.int64())
        return pa.table({"o_orderkey": t["o_orderkey"],
                         "o_custkey": t["o_custkey"],
                         "o_orderdate": t["o_orderdate"],
                         "cents": c})

    out = window_over(orders.map_batches(cents, batch_format="pyarrow"),
                      partition_by="o_custkey",
                      order_by=["o_orderdate", "o_orderkey"],
                      row_number="rn",
                      lag={"prev_orderkey": "o_orderkey"},
                      cumsum={"run_cents": "cents"})
    return out.select_columns(["o_orderkey", "o_custkey", "rn",
                               "run_cents", "prev_orderkey"])


def _q_lineitem_rank(sf_dir: str):
    """RANK / DENSE_RANK per supplier ordered by l_quantity — real
    ties (quantity is small-integer-valued), where row_number would be
    nondeterministic but rank/dense_rank are exact."""
    from dedupe_api_ray.stages.windows import window_over

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_linenumber", "l_suppkey",
                        "l_quantity"])
    return window_over(li, partition_by="l_suppkey",
                       order_by=["l_quantity"],
                       rank="rnk", dense_rank="drnk")


def _q_lineitem_quantiles(sf_dir: str):
    """Exact order-statistic quantiles of l_extendedprice (rank
    ceil(q*N), nulls excluded) via the selection-not-sort histogram
    stage — two streaming passes, no sort shuffle.  Both sides compute
    the rank with the SAME IEEE double multiply (the oracle casts q to
    DOUBLE; DuckDB's bare numeric literals are DECIMAL and would round
    q*N differently when it lands near an integer)."""
    from dedupe_api_ray.stages.quantiles import exact_quantiles
    from dedupe_api_ray.utils import round_half_away

    li = _read(sf_dir, "lineitem", columns=["l_extendedprice"])
    out = exact_quantiles(li, "l_extendedprice",
                          [0.01, 0.25, 0.5, 0.75, 0.99])
    cents = round_half_away(
        out["value"].to_numpy(zero_copy_only=False) * 100.0, 0)
    return pa.table({"q": out["q"],
                     "value_cents": pa.array(cents.astype(np.int64),
                                             pa.int64())})


def _q_events_type_quantiles_cont(sf_dir: str):
    """Linear-interpolated (SQL quantile_cont) per-type quantiles of
    value — the oracle replays the EXACT interpolation expression
    (v_lo + (h-lo)*(v_hi-v_lo), h = q*(n-1)) instead of calling
    quantile_cont, whose internal expression order is unspecified."""
    from dedupe_api_ray.stages.quantiles import grouped_quantiles

    ev = _read(sf_dir, "events", columns=["event_type", "value"]) \
        .map_batches(lambda t: t.filter(pc.is_valid(t["value"])),
                     batch_format="pyarrow")
    return grouped_quantiles(ev, key="event_type", col="value",
                             qs=[0.5, 0.9], interpolation="linear")


def _q_events_props_extract(sf_dir: str):
    """Vectorized JSON scalar extraction from the events.props payload
    (one RE2 extract_regex kernel, no per-row Python) — oracle uses
    DuckDB's REAL JSON functions with the engine's exact int contract
    spelled out (json_type integer + <=18-digit literal ⇒ BIGINT,
    anything else null), so fixture enrichment with quoted/float/bool
    values cannot silently diverge.  Flat-object payloads only, per
    the functions/jsonx.py contract."""
    from dedupe_api_ray.functions.jsonx import extract_json_int

    ev = _read(sf_dir, "events",
               columns=["event_id", "event_type", "props"])

    def ex(t: pa.Table) -> pa.Table:
        return pa.table({"event_id": t["event_id"],
                         "event_type": t["event_type"],
                         "k": extract_json_int(t["props"], "k")})

    return ev.map_batches(ex, batch_format="pyarrow")


def _q_events_type_quantiles(sf_dir: str):
    """Per event_type exact quantiles of value (rank ceil(q*n) within
    the group) — the grouped complement of the global selection
    operator; one key shuffle + one lexsort kernel."""
    from dedupe_api_ray.stages.quantiles import grouped_quantiles

    ev = _read(sf_dir, "events", columns=["event_type", "value"]) \
        .map_batches(lambda t: t.filter(pc.is_valid(t["value"])),
                     batch_format="pyarrow")
    # null values are filtered BEFORE the operator so a hypothetical
    # all-null event_type vanishes on both sides (the engine would
    # otherwise emit its (key, q, NULL) rows; the oracle's WHERE
    # value IS NOT NULL drops the key entirely)
    return grouped_quantiles(ev, key="event_type", col="value",
                             qs=[0.5, 0.9, 0.99])


def _q_q3_top_orders(sf_dir: str):
    """TPC-H-Q3-style composition: BUILDING customers → their orders
    (Bloom semi join: non-BUILDING orders bypass the shuffle) → their
    lineitems (second Bloom semi join) → per-order revenue (map-side
    partial sums) → exact global top-10 without a full sort."""
    from ray.data.aggregate import Sum

    from dedupe_api_ray.stages.semi import semi_join
    from dedupe_api_ray.stages.topk import global_topk

    cust = _read(sf_dir, "customer",
                 columns=["c_custkey", "c_mktsegment"]) \
        .map_batches(lambda t: t.filter(
            pc.equal(t["c_mktsegment"], "BUILDING")),
            batch_format="pyarrow")
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    sel = semi_join(orders, cust, left_on="o_custkey",
                    right_on="c_custkey", prefilter="bloom")
    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_extendedprice", "l_discount"])
    sel_li = semi_join(li, sel, left_on="l_orderkey",
                       right_on="o_orderkey", prefilter="bloom")

    def partial(t: pa.Table) -> pa.Table:
        rev = pc.multiply(t["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), t["l_discount"]))
        g = pa.table({"l_orderkey": t["l_orderkey"], "rev": rev}) \
            .group_by(["l_orderkey"]).aggregate([("rev", "sum")])
        return pa.table({"l_orderkey": g["l_orderkey"],
                         "rev": g["rev_sum"]})

    agg = sel_li.map_batches(partial, batch_format="pyarrow") \
        .groupby("l_orderkey").aggregate(Sum("rev", alias_name="rev"))

    def finish(t: pa.Table) -> pa.Table:
        cents = pc.cast(_r(pc.multiply(t["rev"], 100.0), 0), pa.int64())
        return pa.table({"l_orderkey": t["l_orderkey"],
                         "rev_cents": cents})

    return global_topk(agg.map_batches(finish, batch_format="pyarrow"),
                       ["rev_cents", "l_orderkey"], 10,
                       descending=[True, False])


def _q_orders_rollup(sf_dir: str):
    """GROUP BY ROLLUP(o_orderstatus, o_orderpriority): sum of price
    cents + count at every prefix level with a grouping_id bitmask
    (bit i set = keys[i] rolled up; the oracle builds the same mask
    explicitly since SQL GROUPING_ID bit order is the reverse).  One
    wide shuffle; coarser levels cascade off aggregated data."""
    from dedupe_api_ray.stages.rollup import rollup_aggregate

    orders = _read(sf_dir, "orders",
                   columns=["o_orderstatus", "o_orderpriority",
                            "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        cents = pc.cast(_r(pc.multiply(t["o_totalprice"], 100.0), 0),
                        pa.int64())
        return pa.table({"o_orderstatus": t["o_orderstatus"],
                         "o_orderpriority": t["o_orderpriority"],
                         "cents": cents})

    return rollup_aggregate(
        orders.map_batches(prep, batch_format="pyarrow"),
        keys=["o_orderstatus", "o_orderpriority"],
        sums={"total_cents": "cents"})


def _q_supplier_distinct_parts(sf_dir: str):
    """Per supplier: lineitem count + exact COUNT(DISTINCT l_partkey),
    one key-partitioned shuffle with map-side pair combining."""
    from dedupe_api_ray.stages.distinct import grouped_distinct_count

    li = _read(sf_dir, "lineitem", columns=["l_suppkey", "l_partkey"])
    return grouped_distinct_count(li, key="l_suppkey", col="l_partkey",
                                  n_rows="n_lineitems",
                                  n_distinct="n_parts")


def _q_q1_lineitem(sf_dir: str):
    li = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_linestatus", "l_quantity",
                        "l_extendedprice", "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        # Arrow-native partial groupby — no pandas copy per batch
        disc_price = pc.multiply(t["l_extendedprice"],
                                 pc.subtract(pa.scalar(1.0), t["l_discount"]))
        tbl = pa.table({"l_returnflag": t["l_returnflag"],
                        "l_linestatus": t["l_linestatus"],
                        "qty": t["l_quantity"], "rev": disc_price})
        g = tbl.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("qty", "sum"), ("rev", "sum"),
             ("qty", "count", pc.CountOptions(mode="all"))])
        return pa.table({"l_returnflag": g["l_returnflag"],
                         "l_linestatus": g["l_linestatus"],
                         "sum_qty": g["qty_sum"], "sum_rev": g["rev_sum"],
                         "n": g["qty_count"]})

    from ray.data.aggregate import Sum
    # 6 output groups: a handful of reduce partitions, not 2×CPUs —
    # avoids a fleet of empty final blocks (and their schema warnings)
    agg = li.map_batches(partial, batch_format="pyarrow") \
        .groupby(["l_returnflag", "l_linestatus"], num_partitions=4) \
        .aggregate(
            Sum("sum_qty", alias_name="sum_qty"),
            Sum("sum_rev", alias_name="sum_rev"),
            Sum("n", alias_name="n"))
    def finish(t: pa.Table) -> pa.Table:
        # integer cents: immune to float-repr drift across engines
        qty_c = pc.cast(_r(pc.multiply(t["sum_qty"], 100.0), 0), pa.int64())
        rev_c = pc.cast(_r(pc.multiply(t["sum_rev"], 100.0), 0), pa.int64())
        return pa.table({"l_returnflag": t["l_returnflag"],
                         "l_linestatus": t["l_linestatus"],
                         "sum_qty_cents": qty_c, "sum_rev_cents": rev_c,
                         "n": t["n"]})

    return agg.map_batches(finish, batch_format="pyarrow")


def _q_orders_customer_join(sf_dir: str):
    from dedupe_api_ray.utils import default_num_partitions

    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    joined = orders.join(cust, join_type="inner",
                         num_partitions=default_num_partitions(),
                         on=("o_custkey",), right_on=("c_custkey",))

    def partial(t: pa.Table) -> pa.Table:
        # Arrow-native partial groupby — no pandas copy per batch
        g = t.group_by("c_mktsegment").aggregate(
            [("o_totalprice", "count", pc.CountOptions(mode="all")),
             ("o_totalprice", "sum")])
        return pa.table({"c_mktsegment": g["c_mktsegment"],
                         "n_orders": g["o_totalprice_count"],
                         "total": g["o_totalprice_sum"]})

    from ray.data.aggregate import Sum
    # 5 market segments: small fixed reduce fan-in (see q1 note)
    agg = joined.map_batches(partial, batch_format="pyarrow") \
        .groupby("c_mktsegment", num_partitions=4).aggregate(
            Sum("n_orders", alias_name="n_orders"),
            Sum("total", alias_name="total"))
    def finish(t: pa.Table) -> pa.Table:
        cents = pc.cast(_r(pc.multiply(t["total"], 100.0), 0), pa.int64())
        return pa.table({"c_mktsegment": t["c_mktsegment"],
                         "n_orders": t["n_orders"], "total_cents": cents})

    return agg.map_batches(finish, batch_format="pyarrow")


def _q_orders_customer_left(sf_dir: str):
    """General LEFT OUTER JOIN (stages/joins.py): every customer, with
    their >= 400k orders attached and nulls where none exist.  Oracle:
    the literal SQL LEFT JOIN."""
    from dedupe_api_ray.stages.joins import left_join

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    orders = _read(sf_dir, "orders",
                   columns=["o_custkey", "o_orderkey", "o_totalprice"])

    def high(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t["o_totalprice"], 400000.0))
        cents = pc.cast(_r(pc.multiply(t["o_totalprice"], 100.0), 0),
                        pa.int64())
        return pa.table({"o_custkey": t["o_custkey"],
                         "o_orderkey": t["o_orderkey"],
                         "o_price_cents": cents})

    return left_join(cust, orders.map_batches(high, batch_format="pyarrow"),
                     on="c_custkey", right_on="o_custkey",
                     right_cols=["o_orderkey", "o_price_cents"])


def _q_orders_customer_full(sf_dir: str):
    """FULL OUTER JOIN (stages/joins.py::full_outer_join): positive-
    balance customers x >= 400k orders — customers with no such order
    keep null order columns, and high orders whose customer has a
    NEGATIVE balance surface as right-unmatched rows with their
    custkey in the shared key column (USING/COALESCE semantics).
    Oracle: the literal SQL FULL OUTER JOIN with coalesce."""
    from dedupe_api_ray.stages.joins import full_outer_join

    cust = _read(sf_dir, "customer",
                 columns=["c_custkey", "c_mktsegment", "c_acctbal"])

    def pos(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t["c_acctbal"], 0.0))
        return pa.table({"c_custkey": t["c_custkey"],
                         "c_mktsegment": t["c_mktsegment"]})

    orders = _read(sf_dir, "orders",
                   columns=["o_custkey", "o_orderkey", "o_totalprice"])

    def high(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t["o_totalprice"], 400000.0))
        cents = pc.cast(_r(pc.multiply(t["o_totalprice"], 100.0), 0),
                        pa.int64())
        return pa.table({"o_custkey": t["o_custkey"],
                         "o_orderkey": t["o_orderkey"],
                         "o_price_cents": cents})

    return full_outer_join(
        cust.map_batches(pos, batch_format="pyarrow"),
        orders.map_batches(high, batch_format="pyarrow"),
        on="c_custkey", right_on="o_custkey",
        right_cols=["o_orderkey", "o_price_cents"])


def _q_events_grouped_agg(sf_dir: str):
    """Generic grouped aggregate (stages/joins.py::grouped_agg) over a
    COMPOSITE key: count(*)/sum/min/max/mean of value-cents per
    (event_type, user bucket).  Mean is emitted as exact-int sum / n
    (both sides compute the identical IEEE division)."""
    from dedupe_api_ray.stages.joins import grouped_agg

    ev = _read(sf_dir, "events",
               columns=["event_type", "user_id", "value"])

    def prep(t: pa.Table) -> pa.Table:
        cents = pc.cast(_r(pc.multiply(t["value"], 100.0), 0), pa.int64())
        bucket = pc.cast(
            pc.bit_wise_and(t["user_id"], pa.scalar(7, pa.int64())),
            pa.int64())
        return pa.table({"event_type": t["event_type"],
                         "user_bucket": bucket, "value_cents": cents})

    agg = grouped_agg(
        ev.map_batches(prep, batch_format="pyarrow"),
        keys=["event_type", "user_bucket"],
        aggs={"n": ("*", "count"),
              "sum_cents": ("value_cents", "sum"),
              "min_cents": ("value_cents", "min"),
              "max_cents": ("value_cents", "max"),
              "mean_cents": ("value_cents", "mean")})
    return agg.map_batches(
        lambda t: t.set_column(t.column_names.index("mean_cents"),
                               "mean_cents", _r(t["mean_cents"], 6)),
        batch_format="pyarrow")


# --- minhash / near-dup (md5 family, SQL-reproducible) ---------------------

_NUM_PERM = 8
_BANDS = 4


def _md5_minhash_bands(doc_id: int, text: str) -> list[tuple[int, int, str]]:
    toks = sorted(set(TOKEN_RE.findall((text or "").lower())))
    rows = []
    if not toks:
        return rows
    per = _NUM_PERM // _BANDS
    hs = []
    for i in range(_NUM_PERM):
        hs.append(min(hashlib.md5(f"{i}:{t}".encode()).hexdigest()
                      for t in toks))
    for b in range(_BANDS):
        chunk = hs[b * per:(b + 1) * per]
        key = hashlib.md5("|".join(chunk).encode()).hexdigest()
        rows.append((doc_id, b, key))
    return rows


def _q_minhash_bands(sf_dir: str):
    def fn(t: pa.Table) -> pa.Table:
        ids, bands, keys = [], [], []
        for did, x in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            for d, b, k in _md5_minhash_bands(did, x):
                ids.append(d)
                bands.append(b)
                keys.append(k)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "band": pa.array(bands, pa.int64()),
                         "band_key": pa.array(keys, pa.string())})
    return _docs(sf_dir).map_batches(fn, batch_format="pyarrow")


def _q_near_dup_pairs(sf_dir: str):
    """LSH candidates from the md5 band keys (hot buckets salted
    losslessly — extras.dedup.lsh_candidate_pairs), verified with exact
    token-set Jaccard >= 0.6 via the size-routed payload path (join
    above the broadcast threshold — no whole-corpus broadcast at
    scale)."""
    from dedupe_api_ray.extras.dedup import (jaccard_verify_pairs,
                                             lsh_candidate_pairs)

    bands = _q_minhash_bands(sf_dir)

    # band_key is an md5 hex over the band's hashes; collisions across
    # band indexes are impossible in practice, but fold band in anyway
    def fold(t: pa.Table) -> pa.Table:
        key = [f"{b}|{k}" for b, k in zip(t["band"].to_pylist(),
                                          t["band_key"].to_pylist())]
        return pa.table({"band_key": pa.array(key, pa.string()),
                         "doc_id": t["doc_id"]})

    cands = lsh_candidate_pairs(bands.map_batches(fold,
                                                  batch_format="pyarrow"))
    return jaccard_verify_pairs(cands, _docs(sf_dir), threshold=0.6)


def _q_simhash_near_dup(sf_dir: str):
    """SimHash near-dup pairs at Hamming <= 3 over the md5 (SQL-
    reproducible) signature family; pigeonhole 4-chunk blocking gives
    recall 1.0 by construction, so the oracle can enumerate pairs from
    the same chunk join and the sets match exactly."""
    from dedupe_api_ray.extras.dedup import simhash_near_dup_pairs

    return simhash_near_dup_pairs(_docs(sf_dir), max_hamming=3,
                                  family="md5")


def _q_fuzzy_dedup(sf_dir: str):
    """End-to-end fuzzy dedup — THE canonical LLM-training-data
    pipeline: MinHash-LSH candidates → exact-Jaccard verify (>= 0.6)
    → connected components over the near-dup graph → every doc mapped
    to its component representative (min doc_id; unique docs map to
    themselves).  Downstream keeps rows where doc_id == rep_id."""
    from dedupe_api_ray.stages.clustering import connected_components
    from dedupe_api_ray.utils import default_num_partitions

    pairs = _q_near_dup_pairs(sf_dir)
    edges = pairs.map_batches(
        lambda t: pa.table({"u": t["id_a"], "v": t["id_b"]}),
        batch_format="pyarrow")
    labels = connected_components(edges, mode="distributed")
    all_ids = _docs(sf_dir).select_columns(["doc_id"])
    left = all_ids.join(
        labels.map_batches(
            # rename BY NAME: a positional rename_columns would silently
            # mis-map if the (record_id, component_id) column order ever
            # differed between the driver and distributed CC paths
            lambda t: pa.table({"__rid": t["record_id"],
                                "component_id": t["component_id"]}),
            batch_format="pyarrow"),
        join_type="left_outer", num_partitions=default_num_partitions(),
        on=("doc_id",), right_on=("__rid",))
    return left.map_batches(
        lambda t: pa.table({"doc_id": t["doc_id"],
                            "rep_id": pc.coalesce(t["component_id"],
                                                  t["doc_id"])}),
        batch_format="pyarrow")


def _q_simhash(sf_dir: str):
    """SimHash via the md5 (SQL-reproducible) family so the oracle can
    verify it bit-for-bit; the blake2b family (extras.dedup.SimHasher)
    is the scale path and is unit-tested."""
    from dedupe_api_ray.extras.dedup import simhash_md5_table

    return simhash_md5_table(_docs(sf_dir))


def _q_embedding_topk(sf_dir: str):
    from dedupe_api_ray.extras.similarity import brute_force_topk

    emb = _read(sf_dir, "embeddings")
    head = emb.filter(lambda r: r["vec_id"] < 10)
    qdf = head.to_pandas().sort_values("vec_id")
    out = brute_force_topk(emb, np.stack(qdf["embedding"].to_list()),
                           qdf["vec_id"].to_numpy(), k=5)
    return out.map_batches(
        lambda t: pa.table({"query_id": t["query_id"], "vec_id": t["vec_id"],
                            "score": _r(t["score"], 4)}),
        batch_format="pyarrow")


def _q_embedding_topk_ivf(sf_dir: str):
    """IVF top-k through the MATERIALIZED index path (build partitioned
    layout → probe partition dirs → grouped reduce) with nprobe = all
    centroids, which is exact — so the same SQL top-k oracle applies.
    The pruned (nprobe < n_centroids) behavior is covered by
    tests/test_pipeline_extras.py::test_ivf_partition_pruning (the
    centroid training is iterative k-means, not SQL-expressible)."""
    import tempfile

    from dedupe_api_ray.extras.similarity import ivf_topk

    emb = _read(sf_dir, "embeddings")
    head = emb.filter(lambda r: (10 <= r["vec_id"]) and (r["vec_id"] < 18))
    qdf = head.to_pandas().sort_values("vec_id")
    out = ivf_topk(emb, np.stack(qdf["embedding"].to_list()),
                   qdf["vec_id"].to_numpy(), k=4, n_centroids=8, nprobe=8,
                   index_dir=tempfile.mkdtemp(prefix="ivf_q_"))
    return out.map_batches(
        lambda t: pa.table({"query_id": t["query_id"], "vec_id": t["vec_id"],
                            "score": _r(t["score"], 4)}),
        batch_format="pyarrow")


def _q_embedding_near_dup(sf_dir: str):
    """Exact all-pairs cosine >= 0.35 (single-bucket variant of the LSH
    path so the SQL oracle matches; the bucketed variant is
    embedding_near_dup_lsh, rows-only)."""
    from dedupe_api_ray.extras.dedup import embedding_near_dup_pairs

    # decimals=4 → ONE rounding, matching the oracle's ROUND(x, 4)
    # directly (engine-default 6 then 4 here double-rounds: a cosine
    # of 0.37784999… flips to 0.3779 while the oracle says 0.3778)
    return embedding_near_dup_pairs(_read(sf_dir, "embeddings"),
                                    threshold=0.35, num_buckets=0,
                                    decimals=4) \
        .map_batches(
            lambda t: t.select(["id_a", "id_b", "cosine"]),
            batch_format="pyarrow")


# Pinned LSH constants, shared by _q_embedding_near_dup_lsh AND its
# oracle SQL (the plane literals are generated from these) so engine
# and oracle cannot drift independently; the query asserts the fixture
# dim still matches before running.
_EMB_LSH_SEED = 42
_EMB_LSH_PLANES = 4
_EMB_LSH_DIM = 64
_EMB_LSH_THRESHOLD = 0.35


def _q_embedding_near_dup_lsh(sf_dir: str):
    from dedupe_api_ray.extras.dedup import embedding_near_dup_pairs

    emb = _read(sf_dir, "embeddings")
    dim = len(emb.take(1)[0]["embedding"])
    if dim != _EMB_LSH_DIM:
        raise RuntimeError(
            f"embeddings dim {dim} != pinned _EMB_LSH_DIM {_EMB_LSH_DIM}: "
            "update the shared constant so the SQL oracle's plane "
            "literals regenerate to match the engine")
    return embedding_near_dup_pairs(emb, threshold=_EMB_LSH_THRESHOLD,
                                    num_buckets=_EMB_LSH_PLANES,
                                    multiprobe=1, seed=_EMB_LSH_SEED)


def _q_kmeans_embeddings(sf_dir: str):
    """Distributed full-corpus Lloyd k-means (k=4, 3 iterations) over
    the embeddings table: centroids broadcast, assignment + partial
    sums fused per batch, k*d-row shuffles.  Deterministic and
    SQL-replayable by construction (min-id init, rounded distances and
    means, lowest-cid tie-break); oracle = the unrolled iteration CTE
    chain."""
    from dedupe_api_ray.extras.similarity import kmeans_fit

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    _cent, assigns = kmeans_fit(emb, k=4, iters=3)
    return assigns


def _kmeans_sql(k: int = 4, iters: int = 3, d: int = 64,
                cent_dp: int = 6, dist_dp: int = 9) -> str:
    """Unrolled Lloyd iterations as a CTE chain — each a{it} is the
    argmin assignment (rounded distance, cid tie-break via
    row_number), each c{it+1} the per-dimension rounded means with
    empty clusters keeping their previous centroid."""
    dist = f"round(list_distance(CAST(e.embedding AS DOUBLE[]), c.c), {dist_dp})"
    ctes = [f"""c0 AS (
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid,
             CAST(embedding AS DOUBLE[]) AS c
      FROM (SELECT vec_id, embedding FROM embeddings
            ORDER BY vec_id LIMIT {k}))"""]
    for it in range(iters):
        ctes.append(f"""a{it} AS (
          SELECT vec_id, cid FROM (
            SELECT e.vec_id, c.cid,
                   row_number() OVER (PARTITION BY e.vec_id
                     ORDER BY {dist}, c.cid) AS rn
            FROM embeddings e CROSS JOIN c{it} c) WHERE rn = 1)""")
        ctes.append(f"""m{it} AS (
          SELECT a.cid, u.i,
                 round(avg(CAST(e.embedding[i] AS DOUBLE)), {cent_dp}) AS m
          FROM embeddings e JOIN a{it} a USING (vec_id),
               unnest(range(1, {d + 1})) AS u(i)
          GROUP BY a.cid, u.i)""")
        ctes.append(f"""c{it + 1} AS (
          SELECT c{it}.cid, coalesce(mm.c, c{it}.c) AS c
          FROM c{it} LEFT JOIN (SELECT cid, list(m ORDER BY i) AS c
                                FROM m{it} GROUP BY cid) mm
          USING (cid))""")
    return "WITH " + ",\n".join(ctes) + f"""
        SELECT vec_id, cid AS cluster_id, round(d9, 6) AS dist FROM (
          SELECT e.vec_id, c.cid, {dist} AS d9,
                 row_number() OVER (PARTITION BY e.vec_id
                   ORDER BY {dist}, c.cid) AS rn
          FROM embeddings e CROSS JOIN c{iters} c) WHERE rn = 1"""


def _q_lang_id(sf_dir: str):
    from dedupe_api_ray.extras.textstats import LangId

    return _docs(sf_dir).map_batches(
        LangId, batch_format="pyarrow", concurrency=(1, 4), num_cpus=1) \
        .select_columns(["doc_id", "lang_pred"])


def _q_doc_fingerprint(sf_dir: str):
    from dedupe_api_ray.extras.textstats import fingerprint_batch

    return _docs(sf_dir).map_batches(
        lambda t: fingerprint_batch(t).select(["doc_id", "fingerprint"]),
        batch_format="pyarrow")


def _q_doc_sample_fraction(sf_dir: str):
    """Deterministic Bernoulli sample (25%, seed 1): shuffle-free
    splitmix64 threshold filter.  Oracle: the same avalanche in
    HUGEINT modular arithmetic."""
    from dedupe_api_ray.extras.sampling import bernoulli_sample

    docs = _read(sf_dir, "documents",
                 columns=["doc_id", "lang", "source", "n_chars"])
    return bernoulli_sample(docs, id_col="doc_id", fraction=0.25, seed=1)


def _q_doc_sample_stratified(sf_dir: str):
    """Exact per-(lang, source) quota sample (n=4, seed 2): the four
    lowest-hash docs per group.  Oracle: row_number() over the same
    splitmix64 ranks."""
    from dedupe_api_ray.extras.sampling import stratified_sample

    docs = _read(sf_dir, "documents",
                 columns=["doc_id", "lang", "source"])
    return stratified_sample(docs, key_cols=["lang", "source"],
                             id_col="doc_id", n=4, seed=2)


def _q_url_canonicalize(sf_dir: str):
    """URL canonicalize + host extract (functions.urls).  The corpus
    has no URL column, so the query plants a messy URL per doc —
    mixed case, default/nondefault/absent ports, unsorted duplicate
    query params, fragments — derived from doc_id IDENTICALLY in the
    SQL oracle (same concat expression), which then replays the
    canonicalization with the same RE2 patterns + list_sort."""
    from dedupe_api_ray.functions.urls import canonicalize_url_batches

    docs = _read(sf_dir, "documents", columns=["doc_id", "source"])

    def synth(t: pa.Table) -> pa.Table:
        did = t["doc_id"]
        dv = did.to_numpy(zero_copy_only=False)
        port = pc.case_when(
            pc.make_struct(pa.array(dv % 3 == 0), pa.array(dv % 3 == 1)),
            ":80", ":8080", "")
        q = pc.if_else(
            pa.array(dv % 2 == 0),
            pc.binary_join_element_wise(
                "?b=", pa.array((dv % 7).astype(str)),
                "&a=", pa.array((dv % 5).astype(str)), ""),
            "")
        frag = pc.if_else(pa.array(dv % 4 == 0), "#s", "")
        url = pc.binary_join_element_wise(
            "HTTP://WWW.", t["source"], ".COM", port,
            "/P", pc.cast(did, pa.string()), q, frag, "")
        return pa.table({"doc_id": did, "url": url})

    return canonicalize_url_batches(
        docs.map_batches(synth, batch_format="pyarrow"))


def _q_pii_redact(sf_dir: str):
    """PII scrub (extras.pii).  The synthetic corpus carries no PII,
    so the query deterministically plants one email / SSN / phone /
    IPv4 per document, derived from doc_id — IDENTICALLY in the SQL
    oracle (same concat expression) — so the redaction kernels are
    exercised on every row.  Counts + redaction are whole-batch Arrow
    RE2 kernels; the augmentation is vectorized too."""
    from dedupe_api_ray.extras.pii import pii_counts_batch, redact_pii_batch

    def fn(t: pa.Table) -> pa.Table:
        did = t["doc_id"].to_numpy(zero_copy_only=False)
        aug = pc.binary_join_element_wise(
            t["text"],
            " contact user", pa.array(did.astype(str)),
            "@example.com call 555-123-",
            pa.array(np.char.zfill((did % 10000).astype(str), 4)),
            " ip 10.0.", pa.array((did % 256).astype(str)),
            ".", pa.array((did % 100).astype(str)),
            " ssn 123-45-6789",
            "")
        out = pa.table({"doc_id": t["doc_id"], "text": aug})
        out = redact_pii_batch(pii_counts_batch(out))
        return out.select(["doc_id", "n_email", "n_ssn", "n_phone",
                           "n_ipv4", "n_pii", "text_redacted"])
    return _docs(sf_dir).map_batches(fn, batch_format="pyarrow")


def _q_repetition_stats(sf_dir: str):
    """Intra-doc repetition quality filters (Gopher/Rae et al. 2021):
    top-token share and duplicated-bigram occurrence share."""
    from dedupe_api_ray.extras.textstats import repetition_stats_batch

    return _docs(sf_dir).select_columns(["doc_id", "text"]).map_batches(
        repetition_stats_batch, batch_format="pyarrow")


def _q_dup_ngram_stats(sf_dir: str):
    """Cross-document duplicate 8-gram statistics (extras.ngram_dup):
    the exact-substring-dedup primitive (Lee et al. 2022) — per doc,
    how many of its distinct 8-token shingles occur in >= 2 docs."""
    from dedupe_api_ray.extras.ngram_dup import dup_ngram_stats

    return dup_ngram_stats(_docs(sf_dir), w=8, min_docs=2,
                           concurrency=(1, 4))


def _q_dup_span_removal(sf_dir: str):
    """Exact-substring dedup REWRITE: remove every token covered by an
    8-token shingle occurring in >= 2 docs (remove-all policy); the
    oracle replays it with string shingles + a coverage join.  The
    engine's 64-bit shingle hashes stand in for the strings (collision
    odds ~n^2/2^64, the same documented equivalence dup_ngram_stats
    uses)."""
    from dedupe_api_ray.extras.ngram_dup import remove_dup_ngrams

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return remove_dup_ngrams(docs, w=8, min_docs=2)


def _q_cc_components(sf_dir: str):
    """G1 over an edge graph defined from the data: documents of the
    same source whose n_chars differ by <= 5 (chains across docs →
    genuine transitivity).  Engine path = the distributed large/small-
    star iteration; oracle = recursive SQL min-label closure."""
    from dedupe_api_ray.stages.clustering import connected_components

    def edges_of(g: pd.DataFrame) -> pd.DataFrame:
        ids = g["doc_id"].to_numpy()
        nch = g["n_chars"].to_numpy()
        order = np.argsort(ids, kind="stable")
        ids, nch = ids[order], nch[order]
        ia, ib = np.triu_indices(len(ids), k=1)
        keep = np.abs(nch[ia] - nch[ib]) <= 5
        return pd.DataFrame({"u": ids[ia[keep]], "v": ids[ib[keep]]})

    edges = _docs(sf_dir).select_columns(["doc_id", "source", "n_chars"]) \
        .groupby("source").map_groups(edges_of, batch_format="pandas")
    labels = connected_components(edges, mode="distributed")
    # isolated docs are their own component
    all_ids = _docs(sf_dir).select_columns(["doc_id"])
    from dedupe_api_ray.utils import default_num_partitions
    left = all_ids.join(
        labels.map_batches(
            lambda t: pa.table({"__rid": t["record_id"],
                                "component_id": t["component_id"]}),
            batch_format="pyarrow"),
        join_type="left_outer", num_partitions=default_num_partitions(),
        on=("doc_id",), right_on=("__rid",))
    return left.map_batches(
        lambda t: pa.table({"doc_id": t["doc_id"],
                            "component_id": pc.coalesce(t["component_id"],
                                                        t["doc_id"])}),
        batch_format="pyarrow")


def _q_canonicalize(sf_dir: str):
    """M7 proxy with a SQL oracle: per (source, lang) group the
    representative doc = argmin (n_chars, doc_id)."""
    def rep(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["n_chars", "doc_id"]).head(1)
        return g.reset_index(drop=True)
    return _docs(sf_dir).select_columns(["source", "lang", "doc_id", "n_chars"]) \
        .groupby(["source", "lang"]).map_groups(rep, batch_format="pandas")


def _q_gazetteer_topk(sf_dir: str):
    from dedupe_api_ray.pipelines.gazetteer import gazetteer_topn

    docs = _docs(sf_dir)
    queries = docs.filter(lambda r: r["doc_id"] < 20)
    return gazetteer_topn(queries, docs, n=2, threshold=0.3)


def _q_gazetteer_topk_lsh(sf_dir: str):
    """J5/G4 scale path: the same top-n as gazetteer_topk but through
    the MinHash-LSH bipartite blocking route (neither side broadcast —
    the mode a canon set beyond the broadcast bound requires).  With
    single-row bands (bands == num_perm == 64) a candidate pair at the
    0.3 jaccard threshold is missed with probability (1-0.3)^64 ≈
    2e-10, so the output is deterministically identical to the exact
    broadcast scan and shares its SQL oracle."""
    from dedupe_api_ray.pipelines.gazetteer import gazetteer_topn

    docs = _docs(sf_dir)
    queries = docs.filter(lambda r: r["doc_id"] < 20)
    return gazetteer_topn(queries, docs, n=2, threshold=0.3, mode="lsh",
                          lsh_num_perm=64, lsh_bands=64)


def _q_incremental_assign(sf_dir: str):
    """Incremental fold (pipelines/incremental.py): docs with doc_id
    < 50 act as existing cluster representatives (cluster_id =
    doc_id), the rest is the new increment; per new record, the
    best-scoring rep above 0.5 under the pinned documents model
    (firstToken blocking → TF-cosine + source-exact → LR sigmoid).
    Confidence at 6 dp — the scored-pairs contract; ties break on the
    ROUNDED score so float32 ulp noise cannot flip the argmax."""
    from dedupe_api_ray.pipelines.incremental import incremental_assign

    docs = _docs(sf_dir)
    canon = docs.filter(lambda r: r["doc_id"] < 50).map_batches(
        lambda t: pa.table({"cluster_id": t["doc_id"], "text": t["text"],
                            "source": t["source"]}),
        batch_format="pyarrow")
    new = docs.filter(lambda r: r["doc_id"] >= 50).map_batches(
        lambda t: pa.table({"record_id": t["doc_id"], "text": t["text"],
                            "source": t["source"]}),
        batch_format="pyarrow")
    out = incremental_assign(new, canon, documents_model(), threshold=0.5,
                             scorer_concurrency=(1, 4))
    return out.map_batches(
        lambda t: pa.table({
            "record_id": t["record_id"], "cluster_id": t["cluster_id"],
            "confidence": _r(pc.cast(t["confidence"], pa.float64()), 6)}),
        batch_format="pyarrow")


def _q_recordlink_pairs(sf_dir: str):
    """J4: bipartite candidate pairs src0-docs × src1-docs sharing a
    first-token block key."""
    from dedupe_api_ray.pipelines.recordlink import recordlink_candidate_pairs

    def prep(t: pa.Table) -> pa.Table:
        low = [(x or "").lower() for x in t["text"].to_pylist()]
        return pa.table({"record_id": t["doc_id"],
                         "text": pa.array(low, pa.string()),
                         "source": t["source"],
                         "text__tokens": pa.array(
                             [TOKEN_RE.findall(x) for x in low])})

    docs = _docs(sf_dir).map_batches(prep, batch_format="pyarrow")
    side_a = docs.filter(lambda r: r["source"] == "src0")
    side_b = docs.filter(lambda r: r["source"] == "src1")
    model = documents_model()
    return recordlink_candidate_pairs(side_a, side_b, model)


def _q_tfidf_canopy(sf_dir: str):
    """P20 canopy assignment over documents.text.  Oracle: the pinned
    ascending-rid sequential sweep as a recursive CTE (next center =
    min unassigned rid; captures = unassigned docs with TF-IDF cosine
    >= threshold)."""
    from dedupe_api_ray.blocking.canopy import tfidf_canopy_keys

    docs = _docs(sf_dir).map_batches(
        lambda t: pa.table({"record_id": t["doc_id"], "text": t["text"]}),
        batch_format="pyarrow").materialize()
    return tfidf_canopy_keys(docs, "text", threshold=0.6, pred_tag="canopy")


def _q_tfidf_search(sf_dir: str):
    """P21/A2: query docs (doc_id % 5 == 0) against a TF-IDF search
    index over ALL documents; one key per indexed record with cosine
    >= 0.6 (self-matches included — the engine does not exclude a
    query that is also indexed).  Oracle: the same tf-idf weight CTEs
    as tfidf_canopy, pairwise join, no sweep."""
    import numpy as np

    from dedupe_api_ray.blocking.canopy import tfidf_search_keys

    docs = _docs(sf_dir).map_batches(
        lambda t: pa.table({"record_id": t["doc_id"], "text": t["text"]}),
        batch_format="pyarrow").materialize()

    def pick_queries(t: pa.Table) -> pa.Table:
        rid = t["record_id"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(np.asarray(rid) % 5 == 0))

    queries = docs.map_batches(pick_queries, batch_format="pyarrow")
    return tfidf_search_keys(queries, docs, "text", threshold=0.6,
                             pred_tag="search")


def _q_levenshtein_canopy(sf_dir: str):
    """P22 canopy over the source column (short strings)."""
    from dedupe_api_ray.blocking.levenshtein import levenshtein_canopy_keys

    docs = _docs(sf_dir).map_batches(
        lambda t: pa.table({"record_id": t["doc_id"], "source": t["source"]}),
        batch_format="pyarrow").materialize()
    return levenshtein_canopy_keys(docs, "source", distance=1)


def _q_greedy_matching(sf_dir: str):
    """G3 over the verified near-dup pairs (jaccard as score)."""
    from dedupe_api_ray.stages.clustering import greedy_matching

    pairs = _q_near_dup_pairs(sf_dir).map_batches(
        lambda t: pa.table({"id_a": t["id_a"], "id_b": t["id_b"],
                            "score": t["jaccard"]}),
        batch_format="pyarrow")
    return greedy_matching(pairs, threshold=0.6)


def _q_flagship_dedupe(sf_dir: str):
    """Full partition() over documents (rows-only check: one entity row
    per doc; clustering itself is covered by the golden-parity tests)."""
    from dedupe_api_ray.pipelines.dedupe import partition

    docs = _docs(sf_dir).map_batches(
        lambda t: pa.table({"record_id": t["doc_id"], "text": t["text"],
                            "source": t["source"]}),
        batch_format="pyarrow")
    em = partition(docs, documents_model(), threshold=0.5,
                   scorer_concurrency=(1, 4))
    return em.map_batches(
        lambda t: pa.table({"record_id": t["record_id"],
                            "cluster_id": t["cluster_id"]}),
        batch_format="pyarrow")


def _flagship_docs(sf_dir: str) -> ray.data.Dataset:
    return _docs(sf_dir).map_batches(
        lambda t: pa.table({"record_id": t["doc_id"], "text": t["text"],
                            "source": t["source"]}),
        batch_format="pyarrow")


def _q_flagship_scores(sf_dir: str):
    """partition()'s scored candidate pairs (the A1 scorer through the
    REAL pipeline path: normalize → exact-collapse reps → firstToken
    blocking → salted pairs → TF-sidecar cosine + exact feature → LR
    sigmoid).  Score is the engine's float32, widened and rounded at
    6 dp; the oracle recomputes the chain in SQL and applies the same
    float32 cast so double-precision ulp noise cannot flip a digit."""
    from dedupe_api_ray.pipelines.dedupe import partition

    scored = partition(_flagship_docs(sf_dir), documents_model(),
                       threshold=0.5, scorer_concurrency=(1, 4),
                       return_stage="scores")
    return scored.map_batches(
        lambda t: pa.table({
            "id_a": t["id_a"], "id_b": t["id_b"],
            "score": _r(pc.cast(t["score"], pa.float64()), 6)}),
        batch_format="pyarrow")


def _q_flagship_components(sf_dir: str):
    """partition()'s threshold-edge connected components for EVERY
    record (dupes rejoin through their collapse rep; singletons label
    themselves) — the full flagship entity map minus only the
    per-component hierarchical-clustering cut."""
    from dedupe_api_ray.pipelines.dedupe import partition

    em = partition(_flagship_docs(sf_dir), documents_model(),
                   threshold=0.5, scorer_concurrency=(1, 4),
                   return_stage="components")
    return em.map_batches(
        lambda t: pa.table({"record_id": t["record_id"],
                            "component_id": t["cluster_id"]}),
        batch_format="pyarrow")


def _q_dedupe_canon(sf_dir: str):
    """E1 second-pass dedupe (pipelines/dedupe.py::dedupe_canon):
    partition → canonicalize clusters → re-partition the canonical
    records → composed entity map.  Rows-only check (both passes end
    in the non-SQL hclust cut; the pass-1 intermediates are oracled by
    flagship_scores / flagship_components)."""
    from dedupe_api_ray.pipelines.dedupe import dedupe_canon

    final, _canon = dedupe_canon(_flagship_docs(sf_dir),
                                 documents_model(), threshold=0.5,
                                 scorer_concurrency=(1, 4))
    return final.map_batches(
        lambda t: pa.table({"record_id": t["record_id"],
                            "cluster_id": t["cluster_id"]}),
        batch_format="pyarrow")


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        # M1/M3 normalizers + text analysis
        "normalize_documents": _q_normalize,
        "token_counts": _q_token_counts,
        "doc_quality": _q_doc_quality,
        "lang_id": _q_lang_id,
        "doc_fingerprint": _q_doc_fingerprint,
        "url_canonicalize": _q_url_canonicalize,
        "doc_sample_fraction": _q_doc_sample_fraction,
        "doc_sample_stratified": _q_doc_sample_stratified,
        "pii_redact": _q_pii_redact,
        "dup_ngram_stats": _q_dup_ngram_stats,
        "dup_span_removal": _q_dup_span_removal,
        "repetition_stats": _q_repetition_stats,
        # M5/G7 + near-dup family
        "exact_dedup": _q_exact_dedup,
        "minhash_bands": _q_minhash_bands,
        "near_dup_pairs": _q_near_dup_pairs,
        "fuzzy_dedup_docs": _q_fuzzy_dedup,
        "simhash_near_dup": _q_simhash_near_dup,
        "simhash_docs": _q_simhash,
        "embedding_near_dup": _q_embedding_near_dup,
        "embedding_near_dup_lsh": _q_embedding_near_dup_lsh,
        # blocking / pairs (P*, J1/J2, J4)
        "blocking_first_token": _q_blocking_first_token,
        "blocking_multi_predicate": _q_blocking_multi_predicate,
        "predicate_audit": _q_predicate_audit,
        "candidate_pairs_first_token": _q_candidate_pairs,
        "latlong_grid_blocking": _q_latlong_grid,
        "recordlink_pairs": _q_recordlink_pairs,
        "incremental_assign": _q_incremental_assign,
        # aggregates / sorts / top-k (G4/G5, O1–O4)
        "df_counts": _q_df_counts,
        "grouped_topk": _q_grouped_topk,
        "threshold_filter_sort": _q_threshold_filter_sort,
        "events_tumbling": _q_events_tumbling,
        "events_sessionize": _q_events_sessionize,
        "events_orders_asof": _q_events_orders_asof,
        "events_interval_join": _q_events_interval_join,
        "q1_lineitem_agg": _q_q1_lineitem,
        "orders_customer_join": _q_orders_customer_join,
        "orders_customer_left": _q_orders_customer_left,
        "orders_customer_full": _q_orders_customer_full,
        "events_grouped_agg": _q_events_grouped_agg,
        "customer_semi_orders": _q_customer_semi_orders,
        "orders_window": _q_orders_window,
        "orders_splits": _q_orders_splits,
        "lineitem_rank": _q_lineitem_rank,
        "lineitem_price_quantiles": _q_lineitem_quantiles,
        "supplier_distinct_parts": _q_supplier_distinct_parts,
        "events_type_quantiles": _q_events_type_quantiles,
        "events_type_quantiles_cont": _q_events_type_quantiles_cont,
        "events_props_extract": _q_events_props_extract,
        "orders_rollup": _q_orders_rollup,
        "q3_top_orders": _q_q3_top_orders,
        "customer_anti_orders": _q_customer_anti_orders,
        # clustering / canonicalization / gazetteer (G1/G2/G4/M7, J5)
        "cc_components": _q_cc_components,
        "canonicalize_reps": _q_canonicalize,
        "gazetteer_topk": _q_gazetteer_topk,
        "gazetteer_topk_lsh": _q_gazetteer_topk_lsh,
        # similarity search / embedding ML
        "embedding_topk": _q_embedding_topk,
        "embedding_topk_ivf": _q_embedding_topk_ivf,
        "kmeans_embeddings": _q_kmeans_embeddings,
        # canopy / levenshtein / greedy (sequential sweeps — oracled
        # via recursive CTEs that replay the pinned sweep order)
        "tfidf_canopy": _q_tfidf_canopy,
        "tfidf_search": _q_tfidf_search,
        "levenshtein_canopy": _q_levenshtein_canopy,
        "greedy_matching": _q_greedy_matching,
        # flagship
        "flagship_dedupe": _q_flagship_dedupe,
        "flagship_scores": _q_flagship_scores,
        "flagship_components": _q_flagship_components,
        "dedupe_canon": _q_dedupe_canon,
    }


def _splitmix_cte(cols: str, id_col: str, seed: int) -> str:
    """CTE chain computing extras.sampling.sample_hash(id, seed) as a
    UBIGINT column ``h`` over ``documents`` — splitmix64 in HUGEINT
    modular arithmetic, multiplies split into 32-bit halves so the
    products stay inside INT128."""
    m = 1 << 64
    off = ((seed + 1) * 0x9E3779B97F4A7C15) % m

    def mul(zexpr: str, c: int) -> str:
        return (f"cast(((cast({zexpr} AS HUGEINT) * {c >> 32}) "
                f"% 4294967296 * 4294967296 "
                f"+ cast({zexpr} AS HUGEINT) * {c & 0xFFFFFFFF}) "
                f"% {m} AS UBIGINT)")

    return f"""
            WITH z0 AS (SELECT {cols},
                   cast((cast({id_col} AS HUGEINT) + {off}) % {m}
                        AS UBIGINT) AS z FROM documents),
            z1 AS (SELECT {cols},
                   {mul('xor(z, z >> 30)', 0xBF58476D1CE4E5B9)} AS z
                   FROM z0),
            z2 AS (SELECT {cols},
                   {mul('xor(z, z >> 27)', 0x94D049BB133111EB)} AS z
                   FROM z1),
            hh AS (SELECT {cols}, xor(z, z >> 31) AS h FROM z2)"""


def oracle_sql() -> dict[str, str]:
    from dedupe_api_ray.extras.sampling import fraction_threshold
    from dedupe_api_ray.functions.urls import PORT_RE as _PORT_RE
    from dedupe_api_ray.functions.urls import URL_RE as _URL_RE

    per = _NUM_PERM // _BANDS
    # lang_id oracle: the trigram+stopword vote is a deterministic pure
    # function — the SQL scores with the SAME pinned profiles
    from dedupe_api_ray.extras.textstats import _LANG_TRIGRAMS, _STOPWORDS
    _lang_rows = []
    for lang in sorted(_LANG_TRIGRAMS):
        tris = ", ".join(f"'{t}'" for t in sorted(_LANG_TRIGRAMS[lang]))
        stops = ", ".join(f"'{s}'" for s in sorted(_STOPWORDS[lang]))
        _lang_rows.append(f"('{lang}', [{tris}], [{stops}])")
    _langs_sql = ",\n    ".join(_lang_rows)
    # Karp-Rabin window powers (base^15..base^0 mod 2^64) for the
    # doc_fingerprint oracle — HUGEINT arithmetic emulates the engine's
    # uint64 wraparound exactly (extras.textstats.fingerprint_batch)
    _fp_pows = "[" + ", ".join(
        f"{pow(1000003, 15 - j, 1 << 64)}::HUGEINT" for j in range(16)) + "]"
    # pii_redact oracle: the SAME patterns (extras.pii.PII_PATTERNS,
    # RE2-portable by construction) applied in the SAME order; the
    # deterministic PII augmentation is the same concat expression the
    # engine query builds vectorized
    from dedupe_api_ray.extras.pii import PII_PATTERNS
    _pii_aug = ("text || ' contact user' || CAST(doc_id AS VARCHAR) || "
                "'@example.com call 555-123-' || "
                "lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || "
                "' ip 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.' || "
                "CAST(doc_id % 100 AS VARCHAR) || ' ssn 123-45-6789'")
    _pii_counts = []
    _pii_red = "t"
    for _name, _pat, _rep in PII_PATTERNS:
        _p = _pat.replace("'", "''")
        _pii_counts.append(
            f"len(regexp_extract_all(t, '{_p}')) AS n_{_name}")
        _pii_red = f"regexp_replace({_pii_red}, '{_p}', '{_rep}', 'g')"
    _pii_sql = f"""
        WITH aug AS (SELECT doc_id, {_pii_aug} AS t FROM documents),
        c AS (SELECT doc_id, t, {', '.join(_pii_counts)} FROM aug)
        SELECT doc_id, n_email, n_ssn, n_phone, n_ipv4,
               n_email + n_ssn + n_phone + n_ipv4 AS n_pii,
               {_pii_red} AS text_redacted
        FROM c"""
    minhash_cte = f"""
WITH toks AS (
  SELECT doc_id, unnest(list_distinct({_TOK_SQL})) AS tok FROM documents
), mh AS (
  SELECT doc_id, i, min(md5(cast(i AS VARCHAR) || ':' || tok)) AS h
  FROM toks CROSS JOIN (SELECT unnest(range({_NUM_PERM})) AS i)
  GROUP BY doc_id, i
), bands AS (
  SELECT doc_id, i // {per} AS band,
         md5(string_agg(h, '|' ORDER BY i)) AS band_key
  FROM mh GROUP BY doc_id, i // {per}
)"""
    # greedy_matching oracle: the sequential sorted sweep == iterated
    # locally-dominant rounds (a pair accepted by the global greedy iff
    # it is rank-1 in the order (score DESC, id_a, id_b) for BOTH its
    # endpoints among still-unmatched pairs) — the classic parallel
    # greedy-matching equivalence, expressed as a recursive CTE.
    # Scores compare on the ROUNDED jaccard (6 dp), matching the
    # engine's input column exactly (near_dup_pairs is hash-green).
    ndp_cte = minhash_cte.replace("\nWITH toks", "\nWITH RECURSIVE toks") \
        + f""", cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b USING (band, band_key)
  WHERE a.doc_id < b.doc_id
), toksets AS (
  SELECT doc_id, list_distinct({_TOK_SQL}) AS ts FROM documents
), ndp AS (
  SELECT id_a, id_b,
    round(len(list_intersect(x.ts, y.ts)) * 1.0 /
          (len(x.ts) + len(y.ts) - len(list_intersect(x.ts, y.ts))), 6)
      AS score
  FROM cand
  JOIN toksets x ON x.doc_id = id_a
  JOIN toksets y ON y.doc_id = id_b
  WHERE len(list_intersect(x.ts, y.ts)) * 1.0 /
        (len(x.ts) + len(y.ts) - len(list_intersect(x.ts, y.ts))) >= 0.6
)"""
    greedy_sql = ndp_cte + """, g(id_a, id_b, score, acc) AS (
  SELECT id_a, id_b, score, FALSE FROM ndp
  UNION ALL
  SELECT r.id_a, r.id_b, r.score, r.acc FROM (
    WITH rem AS (SELECT id_a, id_b, score FROM g WHERE NOT acc),
    ranked AS (
      SELECT id_a, id_b, score,
             row_number() OVER (PARTITION BY node
                                ORDER BY score DESC, id_a, id_b) AS rn
      FROM (
        SELECT id_a, id_b, score, id_a AS node FROM rem
        UNION ALL
        SELECT id_a, id_b, score, id_b AS node FROM rem
      )
    ), dom AS (
      SELECT id_a, id_b, score FROM ranked
      GROUP BY id_a, id_b, score
      HAVING count(*) FILTER (rn = 1) = 2
    )
    SELECT id_a, id_b, score, TRUE AS acc FROM dom
    UNION ALL
    SELECT r.id_a, r.id_b, r.score, FALSE AS acc
    FROM rem r
    WHERE NOT EXISTS (SELECT 1 FROM dom d
                      WHERE d.id_a IN (r.id_a, r.id_b)
                         OR d.id_b IN (r.id_a, r.id_b))
      AND EXISTS (SELECT 1 FROM dom)
  ) r
)
SELECT id_a, id_b, score FROM g WHERE acc"""
    # fuzzy_dedup oracle: the same verified near-dup edge set, closed
    # under the recursive min-label walk (as cc_components), then each
    # doc labeled with its component minimum (its own id if unique)
    fuzzy_sql = ndp_cte + """, edges AS (
  SELECT id_a AS u, id_b AS v FROM ndp
  UNION SELECT id_b, id_a FROM ndp
), walk(node, lbl) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.v, w.lbl FROM walk w JOIN edges e ON e.u = w.node
  WHERE w.lbl < e.v
)
SELECT node AS doc_id, min(lbl) AS rep_id FROM walk GROUP BY node"""
    # embedding_near_dup_lsh oracle: the hyperplanes, probe-flip list
    # and threshold are ALL generated from the shared pinned constants
    # (_EMB_LSH_SEED/_EMB_LSH_PLANES/_EMB_LSH_DIM/_EMB_LSH_THRESHOLD)
    # that the engine query uses — changing any constant regenerates
    # the SQL in lockstep; a fixture-dim change trips the query's loud
    # RuntimeError instead of a confusing hash mismatch.
    _lsh_planes = np.random.RandomState(_EMB_LSH_SEED).normal(
        size=(_EMB_LSH_PLANES, _EMB_LSH_DIM))
    _plane_rows = ",\n    ".join(
        f"({i}, [{', '.join(repr(float(x)) for x in _lsh_planes[i])}]"
        "::DOUBLE[])" for i in range(_EMB_LSH_PLANES))
    _probe_flips = ", ".join(
        str(f) for f in [0] + [1 << i for i in range(_EMB_LSH_PLANES)])
    lsh_sql = f"""
WITH planes AS (
  SELECT * FROM (VALUES
    {_plane_rows}) p(i, vec)
), v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
), sig AS (
  SELECT vec_id, e,
    sum(CASE WHEN list_inner_product(e, p.vec) > 0
        THEN (1 << p.i) ELSE 0 END)::BIGINT AS code
  FROM v CROSS JOIN planes p GROUP BY vec_id, e
), probes AS (
  SELECT vec_id, e, xor(code, f) AS bucket
  FROM sig CROSS JOIN (SELECT unnest([{_probe_flips}]) AS f)
), cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM probes a JOIN probes b USING (bucket)
  WHERE a.vec_id < b.vec_id
)
SELECT c.id_a, c.id_b,
       round(list_cosine_similarity(x.e, y.e), 6) AS cosine
FROM cand c JOIN v x ON x.vec_id = c.id_a JOIN v y ON y.vec_id = c.id_b
WHERE list_cosine_similarity(x.e, y.e) >= {_EMB_LSH_THRESHOLD}"""
    # simhash_near_dup oracle: same md5-family signature CTE as
    # simhash_docs, then the identical pigeonhole chunk join
    # (63 bits → spans 16/16/16/15, recall 1.0 at Hamming <= 3) and an
    # exact bit_count(xor) verify — engine and SQL enumerate the same
    # pair set by construction.
    simhash_near_sql = f"""
WITH toks AS (
  SELECT doc_id, unnest(list_distinct({_TOK_SQL})) AS tok
  FROM documents
), h AS (
  SELECT doc_id,
         cast(concat('0x', substr(md5(tok), 1, 16)) AS UBIGINT) AS hv
  FROM toks
), votes AS (
  SELECT doc_id, i,
         sum(CASE WHEN (hv >> i) & 1 = 1 THEN 1 ELSE -1 END) AS v
  FROM h CROSS JOIN (SELECT unnest(range(63)) AS i)
  GROUP BY doc_id, i
), sh0 AS (
  SELECT doc_id,
         cast(sum(CASE WHEN v > 0 THEN (1::UBIGINT << i)
                  ELSE 0::UBIGINT END) AS BIGINT) AS simhash
  FROM votes GROUP BY doc_id
), sh AS (
  SELECT d.doc_id, coalesce(sh0.simhash, 0) AS simhash
  FROM documents d LEFT JOIN sh0 USING (doc_id)
), ch AS (
  SELECT s.doc_id, s.simhash,
         c.idx, (s.simhash >> c.sh) & c.mask AS val
  FROM sh s CROSS JOIN (VALUES
    (0, 0, 65535), (1, 16, 65535), (2, 32, 65535), (3, 48, 32767)
  ) c(idx, sh, mask)
  WHERE s.simhash <> 0  -- featureless docs skipped (engine parity)
)
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
       cast(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM ch a JOIN ch b
  ON a.idx = b.idx AND a.val = b.val AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3"""
    # tfidf_canopy / levenshtein_canopy oracles: the sequential
    # ascending-rid canopy sweep as a recursive CTE — each step picks
    # the min unassigned rid as the next center and captures every
    # unassigned record within threshold, exactly the engine's pinned
    # order (blocking/canopy.py::canopy_assign,
    # blocking/levenshtein.py::levenshtein_canopy_keys).  The pairwise
    # similarity relation is precomputed once (cospairs / close) so the
    # recursion only consults it.
    # tfidf_search oracle: same tf-idf weights, pairwise join only —
    # queries are doc_id % 5 == 0 against an index of all documents,
    # self-matches (cosine 1.0) included like the engine's
    tfidf_search_sql = f"""
WITH tf AS (
  SELECT doc_id, tok, count(*)::DOUBLE AS f
  FROM (SELECT doc_id, unnest({_TOK_SQL}) AS tok FROM documents)
  GROUP BY doc_id, tok
), dfc AS (
  SELECT tok, count(*) AS d FROM tf GROUP BY tok
), w0 AS (
  SELECT tf.doc_id, tf.tok,
         tf.f * (ln((SELECT count(*) FROM documents) / (1.0 + dfc.d)) + 1.0)
           AS w
  FROM tf JOIN dfc USING (tok)
), nrm AS (
  SELECT doc_id, sqrt(sum(w * w)) AS nn FROM w0 GROUP BY doc_id
), w AS (
  SELECT w0.doc_id, tok, w / nn AS w FROM w0 JOIN nrm USING (doc_id)
  WHERE nn > 0
)
SELECT 'search:' || CAST(b.doc_id AS VARCHAR) AS block_key,
       a.doc_id AS record_id
FROM w a JOIN w b ON a.tok = b.tok
WHERE a.doc_id % 5 = 0
GROUP BY a.doc_id, b.doc_id
HAVING sum(a.w * b.w) >= 0.6"""
    tfidf_canopy_sql = f"""
WITH RECURSIVE tf AS (
  SELECT doc_id, tok, count(*)::DOUBLE AS f
  FROM (SELECT doc_id, unnest({_TOK_SQL}) AS tok FROM documents)
  GROUP BY doc_id, tok
), dfc AS (
  SELECT tok, count(*) AS d FROM tf GROUP BY tok
), w0 AS (
  SELECT tf.doc_id, tf.tok,
         tf.f * (ln((SELECT count(*) FROM documents) / (1.0 + dfc.d)) + 1.0)
           AS w
  FROM tf JOIN dfc USING (tok)
), nrm AS (
  SELECT doc_id, sqrt(sum(w * w)) AS nn FROM w0 GROUP BY doc_id
), w AS (
  SELECT w0.doc_id, tok, w / nn AS w FROM w0 JOIN nrm USING (doc_id)
  WHERE nn > 0
), cospairs AS (
  SELECT a.doc_id AS da, b.doc_id AS db
  FROM w a JOIN w b ON a.tok = b.tok AND a.doc_id <> b.doc_id
  GROUP BY a.doc_id, b.doc_id
  HAVING sum(a.w * b.w) >= 0.6
), sweep(assigned) AS (
  SELECT CAST([] AS STRUCT(r BIGINT, c BIGINT)[])
  UNION ALL
  SELECT assigned ||
    list_prepend(struct_pack(r := ctr.doc_id, c := ctr.doc_id), coalesce((
      SELECT list(struct_pack(r := x.db, c := ctr.doc_id) ORDER BY x.db)
      FROM cospairs x
      WHERE x.da = ctr.doc_id
        AND NOT list_contains(list_transform(assigned, z -> z.r), x.db)
    ), []))
  FROM sweep, LATERAL (
      SELECT doc_id FROM documents
      WHERE NOT list_contains(list_transform(assigned, z -> z.r), doc_id)
      ORDER BY doc_id LIMIT 1
    ) ctr
), final AS (
  SELECT assigned FROM sweep ORDER BY len(assigned) DESC LIMIT 1
)
SELECT 'canopy:' || CAST(a.c AS VARCHAR) AS block_key, a.r AS record_id
FROM (SELECT unnest(assigned) AS a FROM final)"""
    lev_canopy_sql = """
WITH RECURSIVE vals AS (
  SELECT source AS v, min(doc_id) AS mrid FROM documents
  WHERE source IS NOT NULL AND source <> '' GROUP BY source
), close AS (
  SELECT a.v AS va, b.v AS vb FROM vals a JOIN vals b
  ON levenshtein(a.v, b.v) <= 1
), sweep(assigned) AS (
  SELECT CAST([] AS STRUCT(v VARCHAR, c BIGINT)[])
  UNION ALL
  SELECT assigned || (
      SELECT list(struct_pack(v := x.vb, c := ctr.mrid) ORDER BY x.vb)
      FROM close x
      WHERE x.va = ctr.v
        AND NOT list_contains(list_transform(assigned, z -> z.v), x.vb)
    )
  FROM sweep, LATERAL (
      SELECT v, mrid FROM vals
      WHERE NOT list_contains(list_transform(assigned, z -> z.v), v)
      ORDER BY mrid LIMIT 1
    ) ctr
), final AS (
  SELECT assigned FROM sweep ORDER BY len(assigned) DESC LIMIT 1
), amap AS (
  SELECT a.v AS v, a.c AS c FROM (SELECT unnest(assigned) AS a FROM final)
)
SELECT 'lev:' || CAST(m.c AS VARCHAR) AS block_key, d.doc_id AS record_id
FROM documents d JOIN amap m ON d.source = m.v"""
    # flagship chain (pipelines/dedupe.py::partition): normalize →
    # exact-collapse reps over (text_norm, source) → firstToken
    # blocking → pairs → TF-cosine + exact-source features →
    # sigmoid(10*cos + eq - 8) → threshold-CC → Lance-Williams replay
    # cut.  One parameterized template (_dedupe_chain_ctes/
    # _components_ctes/_replay_ctes above) feeds all four flagship
    # oracles so the SQL cannot drift between them.  The engine scores
    # in float64 then stores float32 (stages/scoring.py::PairScorer);
    # the SQL applies the SAME float32 cast before rounding so
    # double-ulp differences cannot flip a digit.
    flagship_cte = ("\nWITH RECURSIVE " + _dedupe_chain_ctes("documents"))
    flagship_scores_sql = flagship_cte + """
SELECT id_a, id_b, round(CAST(s32 AS DOUBLE), 6) AS score FROM sc"""
    flagship_components_sql = (flagship_cte + ",\n" + _components_ctes() + """
SELECT m.doc_id AS record_id, c.component_id
FROM repmap m JOIN complbl c ON c.rid = m.rid""")
    # the full entity map: per-component hierarchical-clustering cut
    # replayed merge-by-merge (ties, heights and the maxh cut exactly
    # as stages/clustering.py) — flagship_dedupe is fully oracled.
    flagship_dedupe_sql = (flagship_cte + ",\n" + _components_ctes()
                           + ",\n" + _replay_ctes() + """
SELECT record_id, cluster_id FROM em""")
    # dedupe_canon: the whole two-pass pipeline in ONE statement —
    # pass-1 chain+replay over documents, canonicalize each cluster
    # (affine-gap centroid value per field), pass-2 chain+replay over
    # the canonical records, compose record → canon rep → final
    # cluster.
    dedupe_canon_sql = (
        "\nWITH RECURSIVE "
        + _dedupe_chain_ctes("documents", "p1") + ",\n"
        + _components_ctes("p1") + ",\n"
        + _replay_ctes("p1") + ",\n"
        + _canonicalize_ctes("documents", "p1", "canon_records") + ",\n"
        + _dedupe_chain_ctes("canon_records", "p2") + ",\n"
        + _components_ctes("p2") + ",\n"
        + _replay_ctes("p2") + """
SELECT e1.record_id, e2.cluster_id
FROM p1em e1 JOIN p2em e2 ON e2.record_id = e1.cluster_id""")
    sqls = {
        "normalize_documents":
            f"SELECT doc_id, {_NORM_SQL} AS text_norm FROM documents",
        "token_counts":
            f"SELECT doc_id, len({_TOK_SQL}) AS n_tokens FROM documents",
        "doc_quality": f"""
            WITH t AS (
              SELECT doc_id, text, {_TOK_SQL} AS toks FROM documents
            ), s AS (
              SELECT doc_id, text, toks, len(toks) AS n_tokens,
                (SELECT coalesce(sum(len(x)), 0) FROM unnest(toks) AS u(x)) AS tot_len,
                (SELECT count(*) FROM unnest(toks) AS u(x)
                 WHERE x IN ('the','and','of','to','a','in','is','it','that','for')) AS n_stop
              FROM t
            )
            SELECT doc_id, n_tokens,
              CASE WHEN n_tokens > 0 THEN round(tot_len * 1.0 / n_tokens, 6) ELSE 0.0 END AS mean_token_len,
              CASE WHEN n_tokens > 0 THEN round(n_stop * 1.0 / n_tokens, 6) ELSE 0.0 END AS stopword_ratio,
              CASE WHEN len(text) > 0 THEN round(len(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1.0 / len(text), 6) ELSE 0.0 END AS alpha_ratio
            FROM s""",
        "exact_dedup":
            "SELECT min(doc_id) AS doc_id FROM documents GROUP BY text",
        "blocking_first_token": f"""
            SELECT regexp_extract(lower(text), '{_TOK_PATTERN_SQL_ESC}') AS block_key, doc_id
            FROM documents
            WHERE regexp_extract(lower(text), '{_TOK_PATTERN_SQL_ESC}') <> ''""",
        "blocking_multi_predicate": f"""
            SELECT 'firstToken' AS pred,
                   regexp_extract(lower(text), '{_TOK_PATTERN_SQL_ESC}') AS block_key, doc_id
            FROM documents WHERE regexp_extract(lower(text), '{_TOK_PATTERN_SQL_ESC}') <> ''
            UNION ALL
            SELECT 'prefix5', substr(lower(text), 1, 5), doc_id
            FROM documents WHERE lower(text) <> ''
            UNION ALL
            SELECT 'magnitude', cast(cast(round(log10(n_chars)) AS BIGINT) AS VARCHAR), doc_id
            FROM documents WHERE n_chars > 0""",
        "predicate_audit": f"""
            WITH d AS (
              SELECT doc_id, {_NORM_SQL} AS t FROM documents
            ), bm AS (
              SELECT 0 AS pred_index, 'firstTokenPredicate:text' AS predicate,
                     regexp_extract(t, '^{_TOK_PATTERN_SQL_ESC}') AS k, doc_id
              FROM d WHERE t IS NOT NULL
                AND regexp_extract(t, '^{_TOK_PATTERN_SQL_ESC}') <> ''
              UNION ALL
              SELECT 1, 'sameFiveCharStartPredicate:text', substr(t, 1, 5), doc_id
              FROM d WHERE t IS NOT NULL
              UNION ALL
              SELECT 2, 'wholeFieldPredicate:text', t, doc_id
              FROM d WHERE t IS NOT NULL
            ), kc AS (
              SELECT pred_index, predicate, k, count(*) AS c
              FROM bm GROUP BY 1, 2, 3
            )
            SELECT pred_index, predicate,
                   count(*) AS n_keys,
                   CAST(sum(c) AS BIGINT) AS n_rows,
                   CAST(max(c) AS BIGINT) AS max_key_rows,
                   CAST(sum(c * (c - 1) / 2.0) AS DOUBLE) AS est_pairs
            FROM kc GROUP BY 1, 2""",
        "candidate_pairs_first_token": f"""
            WITH bm AS (
              SELECT regexp_extract(lower(text), '{_TOK_PATTERN_SQL_ESC}') AS block_key, doc_id
              FROM documents
              WHERE regexp_extract(lower(text), '{_TOK_PATTERN_SQL_ESC}') <> ''
            )
            SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
            FROM bm a JOIN bm b USING (block_key)
            WHERE a.doc_id < b.doc_id""",
        "recordlink_pairs": f"""
            WITH bm AS (
              SELECT regexp_extract(lower(text), '{_TOK_PATTERN_SQL_ESC}') AS block_key,
                     doc_id, source
              FROM documents
              WHERE source IN ('src0', 'src1')
                AND regexp_extract(lower(text), '{_TOK_PATTERN_SQL_ESC}') <> ''
            )
            SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
            FROM bm a JOIN bm b USING (block_key)
            WHERE a.source = 'src0' AND b.source = 'src1'""",
        "latlong_grid_blocking": """
            SELECT cast(cast(floor((((doc_id * 7919) % 18000) / 100.0 - 90.0) * 10) AS BIGINT) AS VARCHAR)
                   || '|' ||
                   cast(cast(floor((((doc_id * 104729) % 36000) / 100.0 - 180.0) * 10) AS BIGINT) AS VARCHAR)
                   AS block_key, doc_id
            FROM documents
            WHERE NOT (((doc_id * 7919) % 18000) = 9000
                       AND ((doc_id * 104729) % 36000) = 18000)""",
        "df_counts": f"""
            SELECT tok AS token, count(*) AS df FROM (
              SELECT doc_id, unnest(list_distinct({_TOK_SQL})) AS tok
              FROM documents
            ) GROUP BY tok""",
        "grouped_topk": """
            SELECT lang, doc_id, n_chars FROM (
              SELECT lang, doc_id, n_chars,
                row_number() OVER (PARTITION BY lang
                                   ORDER BY n_chars DESC, doc_id) AS rn
              FROM documents
            ) WHERE rn <= 3""",
        "threshold_filter_sort": """
            SELECT event_id, user_id, value FROM events
            WHERE value >= 150.0
            ORDER BY value DESC, event_id LIMIT 100""",
        "events_tumbling": """
            SELECT user_id, date_trunc('hour', ts) AS hour,
                   count(*) AS n,
                   cast(round(sum(value) * 100, 0) AS BIGINT) AS sum_value_cents
            FROM events GROUP BY user_id, date_trunc('hour', ts)""",
        "events_sessionize": """
            WITH o AS (
              SELECT user_id, event_id, ts, value,
                     CASE WHEN lag(ts) OVER w IS NULL
                          OR ts - lag(ts) OVER w > INTERVAL 30 MINUTES
                          THEN 1 ELSE 0 END AS brk
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), s AS (
              SELECT user_id, ts, value,
                     sum(brk) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_id
              FROM o
            )
            SELECT user_id, cast(session_id AS BIGINT) AS session_id,
                   count(*) AS n_events,
                   cast(round(sum(value) * 100, 0) AS BIGINT)
                     AS sum_value_cents,
                   min(ts) AS session_start, max(ts) AS session_end
            FROM s GROUP BY user_id, session_id""",
        "events_orders_asof": """
            SELECT e.event_id, e.ts, e.user_id,
                   o.o_orderkey AS o_orderkey_asof,
                   o.o_totalprice AS o_totalprice_asof
            FROM events e LEFT JOIN LATERAL (
                SELECT o_orderkey, o_totalprice FROM orders
                WHERE o_custkey = e.user_id AND o_orderdate <= e.ts
                  AND o_totalprice >= 450000.0
                ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 1
            ) o ON TRUE""",
        "events_interval_join": """
            SELECT e.event_id, e.ts, e.user_id,
                   h.event_id AS src_event_id_iv,
                   h.value AS src_value_iv
            FROM events e JOIN events h
              ON e.user_id = h.user_id AND h.value >= 100.0
             AND e.ts >= h.ts
             AND e.ts <= h.ts + INTERVAL 12 HOUR""",
        "q1_lineitem_agg": """
            SELECT l_returnflag, l_linestatus,
                   cast(round(sum(l_quantity) * 100, 0) AS BIGINT) AS sum_qty_cents,
                   cast(round(sum(l_extendedprice * (1 - l_discount)) * 100, 0) AS BIGINT) AS sum_rev_cents,
                   count(*) AS n
            FROM lineitem GROUP BY l_returnflag, l_linestatus""",
        "events_type_quantiles_cont": """
            WITH r AS (
              SELECT event_type, value,
                     row_number() OVER (PARTITION BY event_type
                                        ORDER BY value) AS rn,
                     count(*) OVER (PARTITION BY event_type) AS c
              FROM events WHERE value IS NOT NULL
            ), qs AS (SELECT unnest([0.5, 0.9]) AS q),
            b AS (
              SELECT g.event_type, cast(q AS DOUBLE) AS q, g.c,
                     cast(q AS DOUBLE) * (g.c - 1) AS h,
                     cast(floor(cast(q AS DOUBLE) * (g.c - 1))
                          AS BIGINT) AS lo
              FROM (SELECT DISTINCT event_type, c FROM r) g, qs
            )
            SELECT b.event_type, b.q,
                   round(vlo.value + (b.h - b.lo)
                         * (vhi.value - vlo.value), 6) AS value
            FROM b
            JOIN r vlo ON vlo.event_type = b.event_type
                      AND vlo.rn = b.lo + 1
            JOIN r vhi ON vhi.event_type = b.event_type
                      AND vhi.rn = least(b.lo + 2, b.c)""",
        "q3_top_orders": """
            SELECT l_orderkey,
                   cast(round(sum(l_extendedprice * (1 - l_discount))
                              * 100, 0) AS BIGINT) AS rev_cents
            FROM lineitem
            WHERE l_orderkey IN (
              SELECT o_orderkey FROM orders o
              JOIN customer c ON o.o_custkey = c.c_custkey
              WHERE c.c_mktsegment = 'BUILDING')
            GROUP BY l_orderkey
            ORDER BY rev_cents DESC, l_orderkey LIMIT 10""",
        "events_props_extract": """
            WITH j AS (SELECT event_id, event_type,
                              try_cast(props AS JSON) AS pj FROM events)
            SELECT event_id, event_type,
                   CASE WHEN json_type(pj, '$.k')
                             IN ('UBIGINT', 'BIGINT')
                         AND regexp_matches(
                               json_extract_string(pj, '$.k'),
                               '^-?[0-9]{1,18}$')
                        THEN CAST(json_extract_string(pj, '$.k')
                                  AS BIGINT) END AS k
            FROM j""",
        "orders_rollup": """
            SELECT o_orderstatus, o_orderpriority,
                   cast(sum(cast(round(o_totalprice * 100, 0) AS BIGINT))
                        AS BIGINT) AS total_cents,
                   count(*) AS n,
                   cast(grouping(o_orderstatus)
                        + 2 * grouping(o_orderpriority) AS BIGINT)
                     AS grouping_id
            FROM orders
            GROUP BY ROLLUP(o_orderstatus, o_orderpriority)""",
        "lineitem_rank": """
            SELECT l_orderkey, l_linenumber, l_suppkey, l_quantity,
                   cast(rank() OVER w AS BIGINT) AS rnk,
                   cast(dense_rank() OVER w AS BIGINT) AS drnk
            FROM lineitem
            WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_quantity)""",
        "events_type_quantiles": """
            WITH r AS (
              SELECT event_type, value,
                     row_number() OVER (PARTITION BY event_type
                                        ORDER BY value) AS rn,
                     count(*) OVER (PARTITION BY event_type) AS c
              FROM events WHERE value IS NOT NULL
            ), qs AS (SELECT unnest([0.5, 0.9, 0.99]) AS q)
            SELECT event_type, cast(q AS DOUBLE) AS q, value
            FROM qs, r
            WHERE rn = cast(ceil(cast(q AS DOUBLE) * c) AS BIGINT)""",
        "supplier_distinct_parts": """
            SELECT l_suppkey, count(*) AS n_lineitems,
                   count(DISTINCT l_partkey) AS n_parts
            FROM lineitem GROUP BY l_suppkey""",
        "lineitem_price_quantiles": """
            WITH r AS (
              SELECT l_extendedprice AS v,
                     row_number() OVER (ORDER BY l_extendedprice) AS rn
              FROM lineitem WHERE l_extendedprice IS NOT NULL
            ), n AS (SELECT count(*) AS c FROM r),
            qs AS (SELECT unnest([0.01, 0.25, 0.5, 0.75, 0.99]) AS q)
            SELECT cast(q AS DOUBLE) AS q,
                   cast(round(v * 100, 0) AS BIGINT) AS value_cents
            FROM qs, n JOIN r
              ON rn = cast(ceil(cast(q AS DOUBLE) * c) AS BIGINT)""",
        "orders_window": """
            SELECT o_orderkey, o_custkey,
                   cast(row_number() OVER w AS BIGINT) AS rn,
                   cast(sum(cast(round(o_totalprice * 100, 0) AS BIGINT))
                     OVER (PARTITION BY o_custkey
                           ORDER BY o_orderdate, o_orderkey
                           ROWS UNBOUNDED PRECEDING) AS BIGINT)
                     AS run_cents,
                   lag(o_orderkey) OVER w AS prev_orderkey
            FROM orders
            WINDOW w AS (PARTITION BY o_custkey
                         ORDER BY o_orderdate, o_orderkey)""",
        "orders_splits": """
            SELECT o_orderkey, o_custkey,
                   cast(ntile(5) OVER (PARTITION BY o_custkey
                        ORDER BY o_orderdate, o_orderkey) AS BIGINT)
                     AS split,
                   percent_rank() OVER (PARTITION BY o_custkey
                        ORDER BY o_orderdate) AS pr
            FROM orders""",
        "customer_semi_orders": """
            SELECT c_custkey, c_name, c_mktsegment FROM customer c
            WHERE EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_totalprice >= 400000.0)""",
        "customer_anti_orders": """
            SELECT c_custkey, c_name, c_mktsegment FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_custkey = c.c_custkey
                                AND o.o_totalprice >= 400000.0)""",
        "orders_customer_join": """
            SELECT c_mktsegment, count(*) AS n_orders,
                   cast(round(sum(o_totalprice) * 100, 0) AS BIGINT) AS total_cents
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment""",
        "orders_customer_left": """
            SELECT c.c_custkey, c.c_mktsegment, o.o_orderkey,
                   o.o_price_cents
            FROM customer c
            LEFT JOIN (SELECT o_custkey, o_orderkey,
                              cast(round(o_totalprice * 100, 0) AS BIGINT)
                                AS o_price_cents
                       FROM orders WHERE o_totalprice >= 400000.0) o
              ON c.c_custkey = o.o_custkey""",
        "orders_customer_full": """
            SELECT coalesce(c.c_custkey, o.o_custkey) AS c_custkey,
                   c.c_mktsegment, o.o_orderkey, o.o_price_cents
            FROM (SELECT c_custkey, c_mktsegment FROM customer
                  WHERE c_acctbal >= 0.0) c
            FULL OUTER JOIN
                 (SELECT o_custkey, o_orderkey,
                         cast(round(o_totalprice * 100, 0) AS BIGINT)
                           AS o_price_cents
                  FROM orders WHERE o_totalprice >= 400000.0) o
              ON c.c_custkey = o.o_custkey""",
        "events_grouped_agg": """
            WITH prepped AS (
              SELECT event_type, user_id & 7 AS user_bucket,
                     cast(round(value * 100, 0) AS BIGINT) AS value_cents
              FROM events)
            SELECT event_type, user_bucket, count(*) AS n,
                   cast(sum(value_cents) AS BIGINT) AS sum_cents,
                   min(value_cents) AS min_cents,
                   max(value_cents) AS max_cents,
                   round(cast(sum(value_cents) AS DOUBLE)
                         / count(value_cents), 6) AS mean_cents
            FROM prepped GROUP BY event_type, user_bucket""",
        "minhash_bands":
            minhash_cte + "\nSELECT doc_id, band, band_key FROM bands",
        "near_dup_pairs": minhash_cte + f""",
            cand AS (
              SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
              FROM bands a JOIN bands b USING (band, band_key)
              WHERE a.doc_id < b.doc_id
            ), toksets AS (
              SELECT doc_id, list_distinct({_TOK_SQL}) AS ts FROM documents
            )
            SELECT id_a, id_b,
              round(len(list_intersect(x.ts, y.ts)) * 1.0 /
                    (len(x.ts) + len(y.ts) - len(list_intersect(x.ts, y.ts))), 6) AS jaccard
            FROM cand
            JOIN toksets x ON x.doc_id = id_a
            JOIN toksets y ON y.doc_id = id_b
            WHERE len(list_intersect(x.ts, y.ts)) * 1.0 /
                  (len(x.ts) + len(y.ts) - len(list_intersect(x.ts, y.ts))) >= 0.6""",
        "embedding_near_dup": """
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 4) AS cosine
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) >= 0.35""",
        "kmeans_embeddings": _kmeans_sql(),
        "embedding_topk": """
            SELECT query_id, vec_id, round(score, 4) AS score FROM (
              SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
                     list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])) AS score,
                     row_number() OVER (PARTITION BY q.vec_id
                                        ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])) DESC,
                                                 c.vec_id) AS rn
              FROM embeddings q CROSS JOIN embeddings c
              WHERE q.vec_id < 10
            ) WHERE rn <= 5""",
        "embedding_topk_ivf": """
            SELECT query_id, vec_id, round(score, 4) AS score FROM (
              SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
                     list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])) AS score,
                     row_number() OVER (PARTITION BY q.vec_id
                                        ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])) DESC,
                                                 c.vec_id) AS rn
              FROM embeddings q CROSS JOIN embeddings c
              WHERE q.vec_id >= 10 AND q.vec_id < 18
            ) WHERE rn <= 4""",
        "lang_id": f"""
            WITH langs AS (SELECT * FROM (VALUES
                {_langs_sql}) l(lang, tris, stops)),
            feat AS (
              SELECT doc_id,
                     list_distinct([substr(lower(text), i + 1, 3)
                                    FOR i IN range(greatest(len(text) - 2, 0))]) AS doc_tris,
                     (regexp_extract_all(lower(text), '{_TOK_PATTERN_SQL_ESC}'))[1:50] AS toks50
              FROM documents
            ),
            scored AS (
              SELECT f.doc_id, l.lang,
                     len(list_intersect(f.doc_tris, l.tris))
                     + 2 * len(list_filter(f.toks50,
                                           x -> list_contains(l.stops, x))) AS s
              FROM feat f CROSS JOIN langs l
            ),
            best AS (
              SELECT doc_id, lang, s,
                     row_number() OVER (PARTITION BY doc_id
                                        ORDER BY s DESC, lang) AS rn
              FROM scored
            )
            SELECT d.doc_id,
                   CASE WHEN b.s IS NULL OR b.s = 0 THEN 'und'
                        ELSE b.lang END AS lang_pred
            FROM documents d
            LEFT JOIN (SELECT * FROM best WHERE rn = 1) b USING (doc_id)""",
        "doc_fingerprint": f"""
            WITH chars AS (
              SELECT doc_id, unnest(range(len(text))) AS i, text
              FROM documents
            ), cp AS (
              SELECT doc_id, i,
                     unicode(substr(text, cast(i + 1 AS INT), 1))::HUGEINT AS c
              FROM chars
            ), win AS (
              SELECT a.doc_id,
                     (sum(b.c * {_fp_pows}[cast(b.i - a.i + 1 AS INT)]))
                       % 18446744073709551616::HUGEINT AS h
              FROM cp a JOIN cp b
                ON b.doc_id = a.doc_id AND b.i >= a.i AND b.i <= a.i + 15
              GROUP BY a.doc_id, a.i
              HAVING count(*) = 16
            ), sh AS (
              SELECT doc_id,
                     cast(min(h) % 9223372036854775808::HUGEINT AS BIGINT)
                       AS fingerprint
              FROM win GROUP BY doc_id
            )
            SELECT d.doc_id, coalesce(sh.fingerprint, 0) AS fingerprint
            FROM documents d LEFT JOIN sh USING (doc_id)""",
        "pii_redact": _pii_sql,
        "url_canonicalize": f"""
            WITH u AS (
              SELECT doc_id,
                     'HTTP://WWW.' || source || '.COM'
                     || CASE WHEN doc_id % 3 = 0 THEN ':80'
                             WHEN doc_id % 3 = 1 THEN ':8080'
                             ELSE '' END
                     || '/P' || doc_id
                     || CASE WHEN doc_id % 2 = 0
                             THEN '?b=' || (doc_id % 7)
                                  || '&a=' || (doc_id % 5)
                             ELSE '' END
                     || CASE WHEN doc_id % 4 = 0 THEN '#s' ELSE '' END
                       AS url
              FROM documents),
            p AS (
              SELECT doc_id, url,
                     regexp_matches(url, '{_URL_RE}') AS ok,
                     lower(regexp_extract(url, '{_URL_RE}', 1)) AS scheme,
                     regexp_extract(url, '{_URL_RE}', 2) AS auth,
                     regexp_extract(url, '{_URL_RE}', 3) AS path,
                     regexp_extract(url, '{_URL_RE}', 4) AS query
              FROM u),
            hp AS (
              SELECT *,
                     regexp_extract(auth, '{_PORT_RE}', 1) AS usr,
                     lower(regexp_extract(auth, '{_PORT_RE}', 2)) AS h,
                     regexp_extract(auth, '{_PORT_RE}', 3) AS port
              FROM p),
            c AS (
              SELECT *,
                     CASE WHEN usr <> '' THEN usr || '@' ELSE '' END
                     || h || CASE WHEN port <> ''
                               AND port <> (CASE scheme
                                            WHEN 'http' THEN '80'
                                            WHEN 'https' THEN '443'
                                            ELSE '' END)
                               THEN ':' || port ELSE '' END AS hostport,
                     array_to_string(
                       list_sort(string_split(query, '&')), '&')
                       AS qsorted
              FROM hp)
            SELECT doc_id, url,
                   CASE WHEN ok THEN scheme || '://' || hostport || path
                        || CASE WHEN qsorted <> '' THEN '?' || qsorted
                                ELSE '' END
                        ELSE url END AS url_canon,
                   CASE WHEN ok THEN h ELSE NULL END AS host
            FROM c""",
        "doc_sample_fraction": f"""
            {_splitmix_cte("doc_id, lang, source, n_chars", "doc_id", 1)}
            SELECT doc_id, lang, source, n_chars FROM hh
            WHERE h < {fraction_threshold(0.25)}::UBIGINT""",
        "doc_sample_stratified": f"""
            {_splitmix_cte("doc_id, lang, source", "doc_id", 2)}
            SELECT doc_id, lang, source FROM (
              SELECT doc_id, lang, source,
                     row_number() OVER (PARTITION BY lang, source
                                        ORDER BY h, doc_id) AS rn
              FROM hh)
            WHERE rn <= 4""",
        "repetition_stats": f"""
            WITH toks AS (
              SELECT doc_id, {_TOK_SQL} AS ts FROM documents
            ), tok AS (SELECT doc_id, unnest(ts) AS w FROM toks),
            tc AS (SELECT doc_id, w, count(*) AS c FROM tok
                   GROUP BY doc_id, w),
            top AS (SELECT doc_id, max(c) AS mx, sum(c) AS n FROM tc
                    GROUP BY doc_id),
            bg AS (SELECT doc_id,
                          array_to_string(list_slice(ts, i, i + 1), ' ')
                            AS b
                   FROM toks, unnest(range(1, len(ts))) AS u(i)
                   WHERE len(ts) >= 2),
            bc AS (SELECT doc_id, b, count(*) AS c FROM bg
                   GROUP BY doc_id, b),
            bs AS (SELECT doc_id,
                          sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup,
                          sum(c) AS tot
                   FROM bc GROUP BY doc_id)
            SELECT t.doc_id, t.n::BIGINT AS n_tokens,
                   round(t.mx * 1.0 / t.n, 6) AS top_token_ratio,
                   round(coalesce(b.dup, 0) * 1.0 /
                         greatest(coalesce(b.tot, 0), 1), 6)
                     AS dup_bigram_fraction
            FROM top t LEFT JOIN bs b USING (doc_id)""",
        # string shingles stand in for the engine's 64-bit shingle
        # hashes — identical counts up to a ~n^2/2^64 collision
        "dup_ngram_stats": f"""
            WITH toks AS (
              SELECT doc_id, {_TOK_SQL} AS ts FROM documents
            ), sh AS (
              SELECT DISTINCT doc_id,
                     array_to_string(list_slice(ts, i, i + 7), ' ') AS s
              FROM toks, unnest(range(1, len(ts) - 6)) AS u(i)
              WHERE len(ts) >= 8
            ), cnt AS (
              SELECT s, count(*) AS n_docs FROM sh GROUP BY s
            )
            SELECT sh.doc_id, count(*) AS n_shingles,
                   sum(CASE WHEN cnt.n_docs >= 2 THEN 1 ELSE 0
                       END)::BIGINT AS n_dup,
                   round(sum(CASE WHEN cnt.n_docs >= 2 THEN 1 ELSE 0 END)
                         * 1.0 / count(*), 6) AS dup_fraction
            FROM sh JOIN cnt USING (s)
            GROUP BY sh.doc_id""",
        "dup_span_removal": f"""
            WITH toks AS (
              SELECT doc_id, {_TOK_SQL} AS ts FROM documents
            ), wins AS (
              SELECT doc_id, i,
                     array_to_string(list_slice(ts, i, i + 7), ' ') AS s
              FROM toks, unnest(range(1, len(ts) - 6)) AS u(i)
              WHERE len(ts) >= 8
            ), dup AS (
              SELECT s FROM wins GROUP BY s
              HAVING count(DISTINCT doc_id) >= 2
            ), cov AS (
              SELECT DISTINCT w.doc_id, c.j
              FROM wins w JOIN dup USING (s),
                   unnest(range(w.i, w.i + 8)) AS c(j)
            ), tokpos AS (
              SELECT doc_id, j, ts[j] AS tok
              FROM toks, unnest(range(1, len(ts) + 1)) AS u2(j)
            ), kept AS (
              SELECT tp.doc_id, tp.j, tp.tok FROM tokpos tp
              LEFT JOIN cov c ON c.doc_id = tp.doc_id AND c.j = tp.j
              WHERE c.j IS NULL
            )
            SELECT t.doc_id, len(t.ts) AS n_tokens,
                   coalesce(r.n_rem, 0) AS n_removed,
                   coalesce(k.txt, '') AS text_dedup
            FROM toks t
            LEFT JOIN (SELECT doc_id, count(*) AS n_rem FROM cov
                       GROUP BY doc_id) r USING (doc_id)
            LEFT JOIN (SELECT doc_id,
                              string_agg(tok, ' ' ORDER BY j) AS txt
                       FROM kept GROUP BY doc_id) k USING (doc_id)""",
        "simhash_docs": f"""
            WITH toks AS (
              SELECT doc_id, unnest(list_distinct({_TOK_SQL})) AS tok
              FROM documents
            ), h AS (
              SELECT doc_id,
                     cast(concat('0x', substr(md5(tok), 1, 16)) AS UBIGINT) AS hv
              FROM toks
            ), votes AS (
              SELECT doc_id, i,
                     sum(CASE WHEN (hv >> i) & 1 = 1 THEN 1 ELSE -1 END) AS v
              FROM h CROSS JOIN (SELECT unnest(range(63)) AS i)
              GROUP BY doc_id, i
            ), sh AS (
              SELECT doc_id,
                     cast(sum(CASE WHEN v > 0 THEN (1::UBIGINT << i)
                              ELSE 0::UBIGINT END) AS BIGINT) AS simhash
              FROM votes GROUP BY doc_id
            )
            SELECT d.doc_id, coalesce(sh.simhash, 0) AS simhash
            FROM documents d LEFT JOIN sh ON d.doc_id = sh.doc_id""",
        "cc_components": """
            WITH RECURSIVE e0 AS (
              SELECT a.doc_id AS u, b.doc_id AS v
              FROM documents a JOIN documents b
                ON a.source = b.source AND a.doc_id < b.doc_id
               AND abs(a.n_chars - b.n_chars) <= 5
            ), edges AS (
              SELECT u, v FROM e0 UNION SELECT v, u FROM e0
            ), walk(node, lbl) AS (
              SELECT doc_id, doc_id FROM documents
              UNION
              SELECT e.v, w.lbl FROM walk w JOIN edges e ON e.u = w.node
              WHERE w.lbl < e.v
            )
            SELECT node AS doc_id, min(lbl) AS component_id
            FROM walk GROUP BY node""",
        "canonicalize_reps": """
            SELECT source, lang, doc_id, n_chars FROM (
              SELECT source, lang, doc_id, n_chars,
                row_number() OVER (PARTITION BY source, lang
                                   ORDER BY n_chars, doc_id) AS rn
              FROM documents
            ) WHERE rn <= 1""",
        "gazetteer_topk": f"""
            WITH toksets AS (
              SELECT doc_id, list_distinct({_TOK_SQL}) AS ts FROM documents
            ), sims AS (
              SELECT q.doc_id AS query_id, c.doc_id AS canon_id,
                len(list_intersect(q.ts, c.ts)) * 1.0 /
                (len(q.ts) + len(c.ts) - len(list_intersect(q.ts, c.ts))) AS jaccard
              FROM toksets q JOIN toksets c ON q.doc_id <> c.doc_id
              WHERE q.doc_id < 20 AND len(list_intersect(q.ts, c.ts)) > 0
            )
            SELECT query_id, canon_id, round(jaccard, 6) AS jaccard FROM (
              SELECT query_id, canon_id, jaccard,
                row_number() OVER (PARTITION BY query_id
                                   ORDER BY jaccard DESC, canon_id) AS rn
              FROM sims WHERE jaccard >= 0.3
            ) WHERE rn <= 2""",
        "fuzzy_dedup_docs": fuzzy_sql,
        "simhash_near_dup": simhash_near_sql,
        "embedding_near_dup_lsh": lsh_sql,
        "tfidf_canopy": tfidf_canopy_sql,
        "tfidf_search": tfidf_search_sql,
        "levenshtein_canopy": lev_canopy_sql,
        "greedy_matching": greedy_sql,
        "flagship_scores": flagship_scores_sql,
        "flagship_components": flagship_components_sql,
        "flagship_dedupe": flagship_dedupe_sql,
        "dedupe_canon": dedupe_canon_sql,
    }
    # the LSH gazetteer route produces the identical top-n (single-row
    # bands make the blocking recall ~1-2e-10 at the 0.3 threshold),
    # so it shares the exact-scan oracle
    sqls["gazetteer_topk_lsh"] = sqls["gazetteer_topk"]
    # incremental_assign: the recordlink-scored fold of new docs
    # (doc_id >= 50) onto canon reps (doc_id < 50) — same normalize /
    # firstToken / TF-cosine / sigmoid chain as the flagship CTEs but
    # over raw docs (no exact-collapse) and cross-side pairs only,
    # then argmax per new record on the 6-dp-rounded score
    sqls["incremental_assign"] = f"""
WITH inorm AS (
  SELECT doc_id, {_NORM_SQL} AS tnorm, source FROM documents
), itf AS (
  SELECT doc_id, tok, count(*)::DOUBLE AS f
  FROM (SELECT doc_id,
               unnest(regexp_extract_all(tnorm, '{_TOK_PATTERN_SQL_ESC}'))
                 AS tok
        FROM inorm)
  GROUP BY doc_id, tok
), inrm AS (
  SELECT doc_id, sqrt(sum(f * f)) AS nn FROM itf GROUP BY doc_id
), ibm AS (
  SELECT doc_id, source,
         regexp_extract(tnorm, '{_TOK_PATTERN_SQL_ESC}') AS ft
  FROM inorm WHERE regexp_extract(tnorm, '{_TOK_PATTERN_SQL_ESC}') <> ''
), iprs AS (
  SELECT n.doc_id AS id_a, c.doc_id AS id_b,
         CASE WHEN n.source = c.source THEN 1.0 ELSE 0.0 END AS eq
  FROM ibm n JOIN ibm c ON n.ft = c.ft
  WHERE n.doc_id >= 50 AND c.doc_id < 50
), idots AS (
  SELECT p.id_a, p.id_b, sum(ta.f * tb.f) AS dot
  FROM iprs p
  JOIN itf ta ON ta.doc_id = p.id_a
  JOIN itf tb ON tb.doc_id = p.id_b AND tb.tok = ta.tok
  GROUP BY p.id_a, p.id_b
), isc AS (
  SELECT p.id_a, p.id_b,
         CAST(1.0 / (1.0 + exp(-(10.0 *
             LEAST(coalesce(d.dot, 0.0) / (na.nn * nb.nn), 1.0)
             + 1.0 * p.eq - 8.0))) AS REAL) AS s32
  FROM iprs p
  LEFT JOIN idots d ON d.id_a = p.id_a AND d.id_b = p.id_b
  JOIN inrm na ON na.doc_id = p.id_a
  JOIN inrm nb ON nb.doc_id = p.id_b
)
SELECT id_a AS record_id, id_b AS cluster_id,
       round(CAST(s32 AS DOUBLE), 6) AS confidence
FROM (SELECT id_a, id_b, s32,
        row_number() OVER (PARTITION BY id_a
                           ORDER BY round(CAST(s32 AS DOUBLE), 6) DESC,
                                    id_b) AS rn
      FROM isc WHERE s32 >= 0.5)
WHERE rn = 1"""
    return sqls
