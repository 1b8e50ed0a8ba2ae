"""REST in-situ sources: Elasticsearch facets (S3) and federated SimSearch
facets (S4).

The reference mounts attributes from REST services and, per query, asks the
remote service for a k-bounded ranked candidate list
(``manager/insitu/HttpRestConnector.java:149-199``,
``engine/processor/insitu/ElasticSearchRestQuery.java:124-248``,
``engine/processor/insitu/SimSearchRestQuery.java:71-209``).  The Spark-first
translation keeps that contract: the remote service does its own retrieval,
the engine receives only the k-bounded candidate set, and rank aggregation
proceeds over it like any other facet frame.  That is the scale-correct
shape — at 100 TB you do not scan a search service into Spark; you federate
the per-facet top-k and aggregate.

Faithful semantics, by reference file:line:

- ES query dialect (``ElasticSearchRestQuery.java:124-155``): function_score
  + exp decay for numerical/temporal/spatial, ``match`` for
  categorical/textual, optional user filter wrapped in a bool query,
  ``_source`` projection to (key, value), ``size`` bound.
- ES scores are IGNORED; attribute values are fetched and distances are
  recomputed with the engine's own measure, with the k-th distance becoming
  the scale factor (``ElasticSearchRestQuery.java:212-218``) — exactly the
  two-pass auto-scale the ingested facets use, so an ES facet frame feeds
  ``operators.rank_agg.multi_source_topk`` unchanged.
- ES ``_source`` flattening (``ElasticSearchRestQuery.java:397-431``):
  nested objects dot-joined, arrays/duplicates comma-concatenated, geo
  objects collapsed to a coordinate pair.  Divergence, documented: for
  OBJECT-form geo-points the reference emits "lon,lat" (`:407`) then parses
  it as "lat,lon" (`:290-292`), silently swapping axes; we parse each form
  by its actual order instead of reproducing the swap.
- Federated SimSearch facets (``SimSearchRestQuery.java:92,148-189``): a
  single-attribute search with weight 1.0; returned scores are TRUSTED
  verbatim (no local recompute), and random access is prohibited
  (``SimSearchRestQuery.java:54-55``).

All HTTP is stdlib urllib (POST, JSON body, optional api_key header —
``HttpRestConnector.java:320-337``).  Payload builders and response parsers
are pure functions; tests drive them against a canned-response HTTP stub
(tests/test_rest_sources.py), no live service required.
"""

from __future__ import annotations

import json
import urllib.request
from typing import Any

from pyspark.sql import DataFrame, SparkSession

#: ES decay-function parameters per operation
#: (``ElasticSearchRestQuery.java:124-144``)
_ES_DECAY = {"numerical": "1", "temporal": "1d", "spatial": "100m"}

#: reference default bound when the service caps result pages
#: (``HttpRestConnector.java:38``, ``Constants.java`` ES default)
MAX_RESULT_COUNT = 10_000


# ---------------------------------------------------------------------------
# payload builders (pure)
# ---------------------------------------------------------------------------


def es_search_payload(
    kind: str,
    key_column: str,
    value_column: str,
    search_value: Any,
    collection_size: int,
    es_filter: Any | None = None,
) -> dict:
    """The ES request body for one facet (``ElasticSearchRestQuery.java:
    124-155``): decay scoring for metric kinds, match for set/text kinds,
    optional filter context, _source projection, size bound."""
    if kind in ("numerical", "temporal", "spatial"):
        query: dict = {
            "function_score": {
                "query": {"exists": {"field": value_column}},
                "exp": {
                    value_column: {
                        "origin": str(search_value),
                        "scale": _ES_DECAY[kind],
                        "decay": 0.99999,
                    }
                },
            }
        }
    elif kind in ("categorical", "textual"):
        query = {"match": {value_column: str(search_value)}}
    else:
        raise ValueError(f"unsupported ES facet kind {kind!r}")
    if es_filter is not None:
        query = {"bool": {"must": [query], "filter": es_filter}}
    return {
        "_source": [key_column, value_column],
        "query": query,
        "size": min(collection_size, MAX_RESULT_COUNT),
    }


def es_ids_payload(key_column: str, value_column: str, ids: list[str]) -> dict:
    """Random-access value retrieval for specific entities
    (``ElasticSearchRestQuery.java:159,308-317``)."""
    return {
        "_source": [key_column, value_column],
        "query": {"ids": {"values": list(ids)}},
    }


def simsearch_search_payload(kind: str, value_column: Any, search_value: Any, k: int) -> dict:
    """Single-attribute federated request with weight 1.0
    (``SimSearchRestQuery.java:90-92``).  ``value_column`` may be a list for
    spatial (lon, lat) mounts — the reference sends the bracketed form."""
    column = list(value_column) if isinstance(value_column, (list, tuple)) else value_column
    return {
        # the reference caps collectionSize at the connector's maxResultCount
        # BEFORE building the federated request (SimSearchRestQuery ctor) —
        # same cap the ES path applies via es_search_payload (ADVICE r6)
        "k": str(min(int(k), MAX_RESULT_COUNT)),
        "queries": [
            {
                "operation": f"{'spatial_knn' if kind == 'spatial' else kind + '_topk'}",
                "column": column,
                "value": str(search_value),
                "weights": ["1.0"],
            }
        ],
    }


# ---------------------------------------------------------------------------
# response parsing (pure)
# ---------------------------------------------------------------------------


def flatten_source(obj: dict, prefix: str | None = None, out: dict | None = None) -> dict:
    """Flatten a nested ES ``_source`` (``ElasticSearchRestQuery.java:
    397-431``): dict keys dot-joined; a dict holding both "lon" and "lat"
    collapses to a "lon,lat" string; array elements flattened (dicts) or
    comma-concatenated (scalars); duplicate keys comma-concatenated."""
    if out is None:
        out = {}
    for key, val in obj.items():
        name = f"{prefix}.{key}" if prefix else str(key)
        if isinstance(val, dict):
            if {"lon", "lat"} <= set(val):
                out[name] = f"{val['lon']},{val['lat']}"
            else:
                flatten_source(val, name, out)
        elif isinstance(val, list):
            for item in val:
                if isinstance(item, dict):
                    flatten_source(item, name, out)
                else:
                    out[name] = f"{out[name]},{item}" if name in out else str(item)
        else:
            out[name] = f"{out[name]},{val}" if name in out else val
    return out


def _tokenize(raw: str, delimiter: str = ",") -> list[str]:
    """Reference ``Assistant.tokenize`` semantics as used by the REST paths:
    strip double quotes, split, drop empties, distinct, sorted (token sets
    are stored sorted, ``manager/ingested/categorical/TokenSet.java``)."""
    toks = {t.strip() for t in raw.replace('"', "").split(delimiter)}
    return sorted(t for t in toks if t)


def _parse_temporal(val: Any) -> str:
    """Normalize service date/time values to an ISO string Spark casts to
    timestamp (the reference converts to epoch double via DateTimeParser,
    ``ElasticSearchRestQuery.java:276-279`` — same instant, different carrier)."""
    import datetime as dt

    s = str(val).strip()
    if s.isdigit() and len(s) == 14:  # the compact yyyyMMddHHmmss form
        return dt.datetime.strptime(s, "%Y%m%d%H%M%S").strftime("%Y-%m-%d %H:%M:%S")
    return s.replace("T", " ").replace("Z", "")


def _parse_geo(val: Any, lat_lon: bool) -> tuple[float, float]:
    """A service geo value to (lon, lat).  ES string geo-points are
    "lat,lon" (``ElasticSearchRestQuery.java:290-292``); our flatten emits
    object-form points as "lon,lat" (see module docstring divergence note);
    WKT POINT(lon lat) comes from federated SimSearch
    (``SimSearchRestQuery.java:179-182``)."""
    s = str(val).strip()
    if s.upper().startswith("POINT"):
        inner = s[s.index("(") + 1 : s.index(")")].split()
        return float(inner[0]), float(inner[1])
    a, b = (float(x) for x in s.split(","))
    return (b, a) if lat_lon else (a, b)


def _source_node(src: Any, dotted: str) -> Any:
    """Walk a dotted column path through a RAW (un-flattened) ``_source``
    — flatten_source dot-joins nested dict keys, so probing the raw dict
    with a single top-level ``get`` misses every nested path (ADVICE r6).
    Lists mirror flatten's recursion: descend into the first dict item
    that carries the next path segment.  ES also allows LITERAL dotted
    field names ({"loc.point": {...}}), which flatten_source finds under
    the joined key — probe that spelling first so both raw forms agree
    (ADVICE r7)."""
    if isinstance(src, dict) and dotted in src:
        return src[dotted]
    node = src
    for part in str(dotted).split("."):
        if isinstance(node, list):
            node = next(
                (x for x in node if isinstance(x, dict) and part in x), None
            )
        if not isinstance(node, dict) or part not in node:
            return None
        node = node[part]
    return node


def parse_es_hits(
    response: dict,
    kind: str,
    key_column: str,
    value_column: str,
    qgram: int | None = None,
) -> list[tuple[str, Any]]:
    """ES hits → typed (id, value) candidates (``ElasticSearchRestQuery.
    java:197-220,257-300``).  ES relevance scores are deliberately dropped —
    distances are recomputed engine-side."""
    out: list[tuple[str, Any]] = []
    for hit in response.get("hits", {}).get("hits", []):
        flat = flatten_source(hit.get("_source", {}))
        val = flat.get(value_column)
        if val is None:
            continue
        ident = str(flat.get(key_column))
        if kind == "numerical":
            out.append((ident, float(val)))
        elif kind == "temporal":
            out.append((ident, _parse_temporal(val)))
        elif kind == "categorical":
            out.append((ident, _tokenize(str(val))))
        elif kind == "textual":
            out.append((ident, str(val).replace('"', "")))
        elif kind == "spatial":
            # string form from ES is "lat,lon"; object form was flattened to
            # "lon,lat" — distinguish by whether flatten produced it (object
            # form came through the lon,lat collapse).  The probe must walk
            # the DOTTED path through the raw _source: a nested geo-point
            # (e.g. 'loc.point') has no top-level dotted key, and a plain
            # get() would mis-read it as the string "lat,lon" form (ADVICE r6)
            lat_lon = not isinstance(
                _source_node(hit.get("_source", {}), value_column), dict
            )
            out.append((ident, _parse_geo(val, lat_lon=lat_lon)))
        else:
            raise ValueError(f"unsupported ES facet kind {kind!r}")
    return out


def parse_simsearch_results(
    response: list, kind: str, value_column: str
) -> list[tuple[str, Any, float]]:
    """Federated response → (id, typed value, trusted score)
    (``SimSearchRestQuery.java:128-190``): first weight's result list,
    per-item attributes probed for the queried column."""
    out: list[tuple[str, Any, float]] = []
    if not response:
        return out
    items = response[0] or {}
    for item in items.get("rankedResults", []):
        ident = str(item.get("id"))
        val, score = None, 0.0
        for attr in item.get("attributes", []):
            if attr.get("name") == value_column:
                val = attr.get("value")
                score = float(attr.get("score", 0.0))
        if val is None:
            continue
        if kind == "numerical":
            val = float(val)
        elif kind == "temporal":
            val = _parse_temporal(val)
        elif kind == "categorical":
            raw = str(val).replace('"', "")
            if raw.startswith("[") and raw.endswith("]"):
                raw = raw[1:-1]  # SimSearchRestQuery.java:172-174 bracket strip
            val = _tokenize(raw)
        elif kind == "textual":
            val = str(val).replace('"', "")
        elif kind == "spatial":
            val = _parse_geo(val, lat_lon=False)  # WKT POINT(lon lat)
        out.append((ident, val, score))
    return out


# ---------------------------------------------------------------------------
# HTTP + DataFrame assembly
# ---------------------------------------------------------------------------


def post_json(url: str, payload: dict, api_key: str | None = None, timeout: float = 60.0):
    """POST a JSON body and decode the JSON response
    (``HttpRestConnector.java:149-199``; the api_key header mirrors
    ``:333-336``; 60 s timeout mirrors ``:158``)."""
    req = urllib.request.Request(
        url,
        data=json.dumps(payload).encode("utf-8"),
        headers={"Content-Type": "application/json"}
        | ({"api_key": api_key} if api_key else {}),
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        if resp.status != 200:
            raise ConnectionError(f"REST source returned HTTP {resp.status} for {url}")
        return json.loads(resp.read().decode("utf-8"))


_FRAME_TYPE = {
    "numerical": "double",
    "temporal": "string",
    "categorical": "array<string>",
    "textual": "string",
}


def es_facet_frame(
    spark: SparkSession,
    url: str,
    kind: str,
    key_column: str,
    value_column: str,
    search_value: Any,
    collection_size: int,
    es_filter: Any | None = None,
    api_key: str | None = None,
) -> DataFrame:
    """Fetch one ES facet's k-bounded candidates and return them as a
    DataFrame keyed on ``key_column`` — ready for
    ``multi_source_topk({name: frame}, [Facet(...)], ...)``, which recomputes
    distances and applies the two-pass k-th-distance scale exactly as the
    reference does for ES candidates (``ElasticSearchRestQuery.java:212-218``).

    The candidate set is bounded by ``collection_size`` (reference
    ``collectionSize``/``maxResultCount``), so driver-side assembly is O(k),
    never corpus-sized."""
    payload = es_search_payload(
        kind, key_column, value_column, search_value, collection_size, es_filter
    )
    cands = parse_es_hits(post_json(url, payload, api_key), kind, key_column, value_column)
    if kind == "spatial":
        rows = [(i, v[0], v[1]) for i, v in cands]
        return spark.createDataFrame(rows, schema=f"{key_column} string, lon double, lat double")
    return spark.createDataFrame(
        cands, schema=f"{key_column} string, `{value_column}` {_FRAME_TYPE[kind]}"
    )


def es_fetch_values(
    url: str,
    kind: str,
    key_column: str,
    value_column: str,
    ids: list[str],
    api_key: str | None = None,
) -> dict[str, Any]:
    """Random-access value retrieval (R1 extra columns / NRA probes —
    ``ElasticSearchRestQuery.java:308-363``)."""
    payload = es_ids_payload(key_column, value_column, ids)
    return dict(parse_es_hits(post_json(url, payload, api_key), kind, key_column, value_column))


def simsearch_facet_sim_frame(
    spark: SparkSession,
    url: str,
    kind: str,
    facet_name: str,
    key_column: str,
    value_column: Any,
    search_value: Any,
    k: int,
    api_key: str | None = None,
) -> DataFrame:
    """Fetch a federated SimSearch facet and return the pre-scored sim frame
    (key, __facet, __sim) that unions straight into rank aggregation — the
    remote engine's scores are trusted verbatim, never recomputed
    (``SimSearchRestQuery.java:188-189``), and random access is not offered
    (``:54-55``)."""
    from pyspark.sql import functions as F

    payload = simsearch_search_payload(kind, value_column, search_value, k)
    col_probe = (
        value_column if isinstance(value_column, str) else str(list(value_column))
    )
    results = parse_simsearch_results(post_json(url, payload, api_key), kind, col_probe)
    rows = [(i, float(s)) for i, _v, s in results]
    frame = spark.createDataFrame(rows, schema=f"{key_column} string, __sim double")
    return frame.select(
        F.col(key_column), F.lit(facet_name).alias("__facet"), F.col("__sim")
    )
