"""Deterministic synthetic corpora for tests and benchmarks.

Implements FIXTURES.md: a Common-Crawl-style ``pages`` table (url,
warc_ts, html, text, lang) with known duplicate-cluster structure, plus
gold clusters and labeled pairs; and the reference-style tabular
fixture (name/address/zip/phone).  All generation is pure Python,
seed=42, no external data (driver input-table hint, BASELINE.json).
"""

from __future__ import annotations

import hashlib
import random

import numpy as np
import pyarrow as pa

SEED = 42

_BASE_WORDS = (
    "web page crawl data engine index search query result link anchor title "
    "content article news sport market price stock report city council meeting "
    "school health water energy climate science study model train test value "
    "user account login profile photo video music game review rating comment "
    "store product order ship cart deal offer sale item brand blue green red "
    "small large fast slow open close north south east west spring river lake "
    "mountain street road bridge house garden paper book letter word language"
).split()
# widen to ~2000 distinct words so random documents share few tokens
# (a 120-word vocabulary made every pair of docs look near-duplicate,
# which is unrealistic for web text and inflated components)
_VOCAB = _BASE_WORDS + [f"{w}{sfx}" for w in _BASE_WORDS
                        for sfx in ("er", "ing", "ed", "ly", "ster", "ish",
                                    "ton", "ville", "ward", "most", "less",
                                    "ful", "ness", "dom", "oid", "ium")]

_SYNONYM = {
    "fast": "quick", "large": "big", "small": "little", "road": "street",
    "photo": "picture", "article": "story", "deal": "bargain", "house": "home",
}

_BOILER_PRE = [
    "<div class='nav'>home | about | contact</div>",
    "<div class='banner'>subscribe to our newsletter today</div>",
    "<nav>top stories - trending - local</nav>",
]
_BOILER_POST = [
    "<footer>copyright 2024 all rights reserved</footer>",
    "<div class='footer'>privacy policy - terms of service</div>",
    "<footer>follow us on social media</footer>",
]

_HOSTS_POOL = [f"site{i:03d}.example.com" for i in range(120)]
_LANGS = ["en", "de", "fr", "es"]


def record_id_of_url(url: str) -> int:
    """Stable uint64 id = first 8 bytes of blake2b(url); fits int64
    (top bit cleared) so Arrow/DuckDB int64 columns hold it exactly."""
    h = hashlib.blake2b(url.encode(), digest_size=8).digest()
    return int.from_bytes(h, "big") & 0x7FFFFFFFFFFFFFFF


def _base_text(rng: random.Random) -> str:
    n = rng.randint(20, 120)
    words = [rng.choice(_VOCAB) for _ in range(n)]
    # sprinkle integers so integer predicates have signal
    for _ in range(rng.randint(1, 4)):
        words.insert(rng.randrange(len(words)), str(rng.randint(1, 9999)))
    return " ".join(words)


def _corrupt(text: str, rng: random.Random) -> str:
    """Seeded corruption chain (FIXTURES.md §1): token drop/swap,
    whitespace jitter, case flip, synonym substitution, suffix
    truncation, integer perturbation."""
    words = text.split()
    out: list[str] = []
    for w in words:
        r = rng.random()
        if r < 0.05:
            continue  # token drop
        if r < 0.10 and w in _SYNONYM:
            w = _SYNONYM[w]
        elif r < 0.13 and w.isdigit():
            w = str(int(w) + rng.choice((-1, 1)))
        elif r < 0.16:
            w = w.upper() if rng.random() < 0.5 else w.capitalize()
        out.append(w)
    if len(out) > 4 and rng.random() < 0.2:
        i = rng.randrange(len(out) - 1)
        out[i], out[i + 1] = out[i + 1], out[i]
    if len(out) > 10 and rng.random() < 0.15:
        out = out[: -rng.randint(1, 3)]  # suffix truncation
    sep = "  " if rng.random() < 0.1 else " "
    return sep.join(out) if out else text


def _zipf_host(rng: random.Random) -> str:
    # Zipf-ish skewed host pool (hot url_host blocking keys)
    rank = min(int(rng.paretovariate(1.2)), len(_HOSTS_POOL)) - 1
    return _HOSTS_POOL[rank]


def _cluster_size(rng: random.Random) -> int:
    r = rng.random()
    if r < 0.80:
        return 1
    if r < 0.95:
        return rng.randint(2, 4)
    if r < 0.99:
        return rng.randint(5, 20)
    return rng.randint(21, 100)


def make_pages_corpus(n_entities: int = 200, seed: int = SEED) -> dict[str, pa.Table]:
    """Build the pages table + gold_clusters + labeled_pairs.

    Returns dict with keys ``pages``, ``gold_clusters``,
    ``labeled_pairs``.  The ``text`` column is exactly what
    ``extract_text_bytes(html)`` produces (the per-row invariant)."""
    from dedupe_api_ray.functions.text import extract_text_bytes

    rng = random.Random(seed)
    urls: list[str] = []
    warc_ts: list[int] = []
    htmls: list[bytes] = []
    texts: list[str] = []
    langs: list[str] = []
    cluster_of: list[int] = []

    epoch = 1_600_000_000_000_000  # µs
    seen_urls: set[str] = set()
    for ent in range(n_entities):
        base = _base_text(rng)
        host = _zipf_host(rng)
        lang = rng.choices(_LANGS, weights=[85, 5, 5, 5])[0]
        size = _cluster_size(rng)
        for copy in range(size):
            text = base if copy == 0 else _corrupt(base, rng)
            path = f"p{ent}" if copy == 0 else f"p{ent}-{rng.randint(0, 999)}-{copy}"
            url = f"https://{host}/{path}"
            if url in seen_urls:
                url += f".{copy}"
            seen_urls.add(url)
            title = " ".join(text.split()[:4])
            pre = rng.choice(_BOILER_PRE)
            post = rng.choice(_BOILER_POST)
            html = (f"<html><head><title>{title}</title>"
                    f"<script>var x={rng.randint(0, 99)};</script></head>"
                    f"<body>{pre} {text} {post}</body></html>").encode()
            # per-row invariant: text column == extractor(html)
            extracted = extract_text_bytes(html)
            urls.append(url)
            warc_ts.append(epoch + len(urls) * 1_000_000)
            htmls.append(html)
            texts.append(extracted)
            langs.append(lang)
            cluster_of.append(ent)

    rids = [record_id_of_url(u) for u in urls]
    pages = pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(warc_ts, pa.timestamp("us")),
        "html": pa.array(htmls, pa.binary()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
    })
    gold = pa.table({
        "record_id": pa.array(rids, pa.int64()),
        "cluster_id": pa.array(cluster_of, pa.int64()),
    })

    # labeled pairs: all within-cluster positives + hard/random negatives
    by_cluster: dict[int, list[int]] = {}
    for rid, c in zip(rids, cluster_of):
        by_cluster.setdefault(c, []).append(rid)
    pos: list[tuple[int, int]] = []
    for members in by_cluster.values():
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                a, b = sorted((members[i], members[j]))
                pos.append((a, b))
    neg: set[tuple[int, int]] = set()
    n_rows = len(rids)
    # hard negatives: same first token, different cluster
    first_tok: dict[str, list[int]] = {}
    for k, t in enumerate(texts):
        ft = t.split()[0].lower() if t else ""
        first_tok.setdefault(ft, []).append(k)
    for members in first_tok.values():
        rng.shuffle(members)
        for i in range(0, len(members) - 1, 2):
            ka, kb = members[i], members[i + 1]
            if cluster_of[ka] != cluster_of[kb]:
                neg.add(tuple(sorted((rids[ka], rids[kb]))))
    while len(neg) < max(len(pos), 50):
        ka, kb = rng.randrange(n_rows), rng.randrange(n_rows)
        if ka != kb and cluster_of[ka] != cluster_of[kb]:
            neg.add(tuple(sorted((rids[ka], rids[kb]))))
    pairs = sorted([(a, b, True) for a, b in pos] + [(a, b, False) for a, b in neg])
    labeled = pa.table({
        "id_a": pa.array([p[0] for p in pairs], pa.int64()),
        "id_b": pa.array([p[1] for p in pairs], pa.int64()),
        "label": pa.array([p[2] for p in pairs], pa.bool_()),
    })
    return {"pages": pages, "gold_clusters": gold, "labeled_pairs": labeled}


# ---------------------------------------------------------------------------
# Reference-style tabular fixture (FIXTURES.md §3)
# ---------------------------------------------------------------------------

_FIRST = ["anna", "ben", "carla", "david", "elena", "frank", "grace", "henry",
          "iris", "jack", "karen", "liam", "maria", "noah", "olga", "peter"]
_LAST = ["smith", "johnson", "garcia", "miller", "davis", "martinez", "lopez",
         "wilson", "anderson", "taylor", "thomas", "moore", "lee", "clark"]
_STREET = ["main st", "oak ave", "park rd", "lake dr", "hill blvd", "elm st",
           "maple ave", "river rd", "sunset blvd", "2nd ave"]


def make_tabular_fixture(n_entities: int = 100, seed: int = SEED) -> dict[str, pa.Table]:
    """Messy person/org records mirroring the reference's test CSVs
    (Chicago early-childhood style †): name, address, zip, phone with
    seeded corruptions and 30% missing phones."""
    rng = random.Random(seed + 1)
    rows: list[dict] = []
    cluster_of: list[int] = []
    rid = 0
    for ent in range(n_entities):
        name = f"{rng.choice(_FIRST)} {rng.choice(_LAST)}"
        addr = f"{rng.randint(1, 9999)} {rng.choice(_STREET)}"
        zipc = f"{rng.randint(60601, 60699)}"
        phone = f"312-{rng.randint(200, 999)}-{rng.randint(1000, 9999)}"
        n_copies = rng.randint(1, 5)
        for c in range(n_copies):
            r_name, r_addr, r_zip, r_phone = name, addr, zipc, phone
            if c > 0:
                if rng.random() < 0.4:  # typo in name
                    k = rng.randrange(len(r_name))
                    r_name = r_name[:k] + rng.choice("abcdefghij") + r_name[k + 1:]
                if rng.random() < 0.3:  # abbreviate street
                    r_addr = r_addr.replace(" st", " street").replace(" ave", " avenue")
                if rng.random() < 0.2:
                    r_zip = str(int(r_zip) + rng.choice((-1, 1)))
            if rng.random() < 0.30:
                r_phone = None
            rows.append({"record_id": rid, "name": r_name, "address": r_addr,
                         "zip": r_zip, "phone": r_phone})
            cluster_of.append(ent)
            rid += 1
    records = pa.table({
        "record_id": pa.array([r["record_id"] for r in rows], pa.int64()),
        "name": pa.array([r["name"] for r in rows], pa.string()),
        "address": pa.array([r["address"] for r in rows], pa.string()),
        "zip": pa.array([r["zip"] for r in rows], pa.string()),
        "phone": pa.array([r["phone"] for r in rows], pa.string()),
    })
    gold = pa.table({
        "record_id": pa.array(range(len(rows)), pa.int64()),
        "cluster_id": pa.array(cluster_of, pa.int64()),
    })
    by_cluster: dict[int, list[int]] = {}
    for i, c in enumerate(cluster_of):
        by_cluster.setdefault(c, []).append(i)
    pos = [(m[i], m[j]) for m in by_cluster.values()
           for i in range(len(m)) for j in range(i + 1, len(m))]
    neg: set[tuple[int, int]] = set()
    while len(neg) < max(len(pos), 50):
        a, b = rng.randrange(rid), rng.randrange(rid)
        if a != b and cluster_of[a] != cluster_of[b]:
            neg.add(tuple(sorted((a, b))))
    pairs = sorted([(a, b, True) for a, b in pos] + [(a, b, False) for a, b in neg])
    labeled = pa.table({
        "id_a": pa.array([p[0] for p in pairs], pa.int64()),
        "id_b": pa.array([p[1] for p in pairs], pa.int64()),
        "label": pa.array([p[2] for p in pairs], pa.bool_()),
    })
    return {"records": records, "gold_clusters": gold, "labeled_pairs": labeled}


def pairwise_f1(pred: dict[int, int], gold: dict[int, int]) -> float:
    """Pairwise F1 between two clusterings given as record_id→label."""
    def pair_set(assign: dict[int, int]) -> set[tuple[int, int]]:
        groups: dict[int, list[int]] = {}
        for r, c in assign.items():
            groups.setdefault(c, []).append(r)
        out: set[tuple[int, int]] = set()
        for members in groups.values():
            ms = sorted(members)
            for i in range(len(ms)):
                for j in range(i + 1, len(ms)):
                    out.add((ms[i], ms[j]))
        return out

    p, g = pair_set(pred), pair_set(gold)
    if not p and not g:
        return 1.0
    tp = len(p & g)
    prec = tp / len(p) if p else 0.0
    rec = tp / len(g) if g else 0.0
    return 2 * prec * rec / (prec + rec) if prec + rec else 0.0


def np_seed_guard() -> None:  # pragma: no cover
    np.random.seed(SEED)
