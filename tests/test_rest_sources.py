"""REST in-situ sources (S3 Elasticsearch, S4 federated SimSearch) against a
canned-response HTTP stub — no live service.

Covers: payload dialect parity with the reference's request builders,
``_source`` flattening, per-kind value typing, trusted-vs-recomputed score
semantics, end-to-end rank aggregation mixing a REST facet with an ingested
facet, and the engine→federated round trip (our own response formatter's
JSON is a valid federated source for another instance — the same symmetry
the reference exploits, ``SimSearchRestQuery.java`` consuming
``SearchResponseFormat.java`` output).
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest
from pyspark.sql import functions as F

from simsearch_spark.operators.rank_agg import aggregate_sim_frames, multi_source_topk
from simsearch_spark.plans.spec import Facet
from simsearch_spark.sources.rest import (
    MAX_RESULT_COUNT,
    es_facet_frame,
    es_fetch_values,
    es_ids_payload,
    es_search_payload,
    flatten_source,
    parse_es_hits,
    parse_simsearch_results,
    post_json,
    simsearch_facet_sim_frame,
    simsearch_search_payload,
)


# ---------------------------------------------------------------------------
# canned-response HTTP stub
# ---------------------------------------------------------------------------


class _StubHandler(BaseHTTPRequestHandler):
    responses: dict[str, dict | list] = {}
    requests: list[tuple[str, dict]] = []

    def do_POST(self):  # noqa: N802 (http.server API)
        body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
        type(self).requests.append((self.path, body))
        payload = type(self).responses.get(self.path)
        if payload is None:
            self.send_response(404)
            self.end_headers()
            return
        data = json.dumps(payload).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def log_message(self, *args):  # silence
        pass


@pytest.fixture(scope="module")
def stub_server():
    server = HTTPServer(("127.0.0.1", 0), _StubHandler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{server.server_port}"
    server.shutdown()


def _es_hits(hits: list[dict]) -> dict:
    return {"hits": {"hits": [{"_source": s} for s in hits]}}


# ---------------------------------------------------------------------------
# payload dialect (ElasticSearchRestQuery.java:124-159)
# ---------------------------------------------------------------------------


def test_es_payload_decay_kinds():
    p = es_search_payload("numerical", "id", "price", 42.5, 100)
    assert p["_source"] == ["id", "price"]
    assert p["size"] == 100
    fs = p["query"]["function_score"]
    assert fs["query"] == {"exists": {"field": "price"}}
    assert fs["exp"]["price"] == {"origin": "42.5", "scale": "1", "decay": 0.99999}
    assert (
        es_search_payload("temporal", "id", "ts", "2020-01-01", 10)["query"][
            "function_score"
        ]["exp"]["ts"]["scale"]
        == "1d"
    )
    assert (
        es_search_payload("spatial", "id", "loc", "40,-74", 10)["query"][
            "function_score"
        ]["exp"]["loc"]["scale"]
        == "100m"
    )


def test_es_payload_match_filter_and_size_cap():
    p = es_search_payload(
        "categorical",
        "id",
        "tags",
        "spark hadoop",
        MAX_RESULT_COUNT + 5,
        es_filter={"term": {"lang": "en"}},
    )
    assert p["size"] == MAX_RESULT_COUNT  # HttpRestConnector.java:38 cap
    b = p["query"]["bool"]
    assert b["must"] == [{"match": {"tags": "spark hadoop"}}]
    assert b["filter"] == {"term": {"lang": "en"}}
    ids = es_ids_payload("id", "price", ["a", "b"])
    assert ids["query"] == {"ids": {"values": ["a", "b"]}}


def test_simsearch_payload_single_attribute_weight_one():
    p = simsearch_search_payload("categorical", "keywords", "alpha,beta", 25)
    assert p == {
        "k": "25",
        "queries": [
            {
                "operation": "categorical_topk",
                "column": "keywords",
                "value": "alpha,beta",
                "weights": ["1.0"],
            }
        ],
    }
    sp = simsearch_search_payload("spatial", ["lon", "lat"], "POINT (10 20)", 5)
    assert sp["queries"][0]["operation"] == "spatial_knn"
    assert sp["queries"][0]["column"] == ["lon", "lat"]


# ---------------------------------------------------------------------------
# _source flattening (ElasticSearchRestQuery.java:397-431)
# ---------------------------------------------------------------------------


def test_flatten_nested_geo_arrays_duplicates():
    src = {
        "id": "e1",
        "meta": {"author": {"name": "ada"}, "loc": {"lon": 10.5, "lat": 20.25}},
        "tags": ["a", "b"],
        "refs": [{"x": 1}, {"x": 2}],
    }
    flat = flatten_source(src)
    assert flat["meta.author.name"] == "ada"
    assert flat["meta.loc"] == "10.5,20.25"  # lon-first collapse (:407)
    assert flat["tags"] == "a,b"  # scalar array comma-concat
    assert flat["refs.x"] == "1,2"  # duplicate key concat (:420-421)


# ---------------------------------------------------------------------------
# per-kind hit typing (ElasticSearchRestQuery.java:257-300)
# ---------------------------------------------------------------------------


def test_parse_es_hits_typing():
    num = parse_es_hits(_es_hits([{"id": "a", "v": "3.5"}, {"id": "b"}]), "numerical", "id", "v")
    assert num == [("a", 3.5)]  # null value dropped (:264-265)
    cat = parse_es_hits(
        _es_hits([{"id": "a", "v": '"beta","alpha","beta"'}]), "categorical", "id", "v"
    )
    assert cat == [("a", ["alpha", "beta"])]  # quote strip + distinct sort
    tmp = parse_es_hits(_es_hits([{"id": "a", "v": "20200102030405"}]), "temporal", "id", "v")
    assert tmp == [("a", "2020-01-02 03:04:05")]
    txt = parse_es_hits(_es_hits([{"id": "a", "v": '"needle"'}]), "textual", "id", "v")
    assert txt == [("a", "needle")]


def test_parse_es_hits_spatial_both_forms():
    # string form is "lat,lon" (:290-292); object form collapses lon-first
    hits = _es_hits(
        [{"id": "s", "loc": "20.25,10.5"}, {"id": "o", "loc": {"lon": 10.5, "lat": 20.25}}]
    )
    got = dict(parse_es_hits(hits, "spatial", "id", "loc"))
    assert got["s"] == (10.5, 20.25)
    assert got["o"] == (10.5, 20.25)


def test_parse_simsearch_results_trusted_scores():
    resp = [
        {
            "rankedResults": [
                {
                    "id": "x",
                    "attributes": [
                        {"name": "kw", "value": '["b","a"]', "score": 0.875},
                        {"name": "other", "value": "zz", "score": 0.1},
                    ],
                },
                {"id": "y", "attributes": [{"name": "none", "value": "v", "score": 0.5}]},
            ]
        }
    ]
    got = parse_simsearch_results(resp, "categorical", "kw")
    assert got == [("x", ["a", "b"], 0.875)]  # bracket strip (:172-174); y skipped
    wkt = parse_simsearch_results(
        [{"rankedResults": [{"id": "p", "attributes": [{"name": "g", "value": "POINT (1 2)", "score": 0.25}]}]}],
        "spatial",
        "g",
    )
    assert wkt == [("p", (1.0, 2.0), 0.25)]


# ---------------------------------------------------------------------------
# HTTP + end-to-end aggregation
# ---------------------------------------------------------------------------


def test_post_json_sends_api_key(stub_server):
    _StubHandler.responses["/ping"] = {"ok": True}
    assert post_json(f"{stub_server}/ping", {"q": 1}, api_key="sesame") == {"ok": True}
    with pytest.raises(Exception):
        post_json(f"{stub_server}/missing", {})


def test_es_facet_joins_rank_aggregation(spark, stub_server):
    """An ES numerical facet mixed with a local facet must equal computing
    both facets locally: ES candidate VALUES feed the same two-pass
    k-th-distance scoring (scores from the service are ignored)."""
    local = spark.createDataFrame(
        [("a", 10.0), ("b", 20.0), ("c", 30.0), ("d", 40.0)], ["id", "bal"]
    )
    remote_vals = {"a": 100.0, "b": 140.0, "c": 90.0, "d": 400.0}
    _StubHandler.responses["/es/_search"] = _es_hits(
        [{"id": i, "price": v} for i, v in remote_vals.items()]
    )
    es_frame = es_facet_frame(
        spark, f"{stub_server}/es/_search", "numerical", "id", "price", 95.0, 50
    )
    local_dual = spark.createDataFrame(list(remote_vals.items()), ["id", "price"])

    facets = [
        Facet(name="bal", kind="numerical", value_cols=["bal"], query_value=25.0),
        Facet(name="price", kind="numerical", value_cols=["price"], query_value=95.0),
    ]

    def run(price_frame):
        out = multi_source_topk(
            {"bal": local, "price": price_frame}, facets, "id", 3,
            weights={"bal": 0.5, "price": 0.5},
        )
        return [(r.id, r.score) for r in out.collect()]

    assert run(es_frame) == run(local_dual)
    # and the request that went over the wire used the reference dialect
    path, body = _StubHandler.requests[-1]
    assert body["query"]["function_score"]["exp"]["price"]["origin"] == "95.0"


def test_es_fetch_values_random_access(stub_server):
    _StubHandler.responses["/es/_search"] = _es_hits(
        [{"id": "a", "price": 1.5}, {"id": "b", "price": 2.5}]
    )
    got = es_fetch_values(f"{stub_server}/es/_search", "numerical", "id", "price", ["a", "b"])
    assert got == {"a": 1.5, "b": 2.5}
    assert _StubHandler.requests[-1][1]["query"] == {"ids": {"values": ["a", "b"]}}


def test_federated_scores_trusted_and_aggregated(spark, stub_server):
    """Federated sims are NOT rescored: aggregation consumes them verbatim
    alongside a locally scored facet."""
    _StubHandler.responses["/sim/search"] = [
        {
            "rankedResults": [
                {"id": i, "attributes": [{"name": "kw", "value": "x", "score": s}]}
                for i, s in [("a", 0.9), ("b", 0.5), ("c", 0.25)]
            ]
        }
    ]
    fed = simsearch_facet_sim_frame(
        spark, f"{stub_server}/sim/search", "categorical", "kw", "id", "kw", "x", 10
    )
    local_sims = spark.createDataFrame(
        [("a", 0.2), ("b", 0.8), ("d", 1.0)], ["id", "__sim"]
    ).select("id", F.lit("loc").alias("__facet"), "__sim")
    out = aggregate_sim_frames(
        [fed, local_sims], ["kw", "loc"], "id", 4, weights={"kw": 0.5, "loc": 0.5}
    )
    got = {r.id: (r.score, r.kw_sim, r.loc_sim) for r in out.collect()}
    assert got["a"] == (0.55, 0.9, 0.2)
    assert got["b"] == (0.65, 0.5, 0.8)
    assert got["c"] == (0.125, 0.25, None)  # absent facet coalesces to 0 in score
    assert got["d"] == (0.5, None, 1.0)


def test_engine_response_round_trips_as_federated_source(spark, stub_server):
    """Symmetry: our own response formatter's JSON is a consumable federated
    source — one engine instance can mount another, exactly the reference's
    SimSearch-to-SimSearch federation."""
    from simsearch_spark.operators.response import format_response
    from simsearch_spark.plans.spec import SearchRequest

    df = spark.createDataFrame(
        [("a", 0.75, 0.75), ("b", 0.5, 0.5)], ["id", "score", "kw_sim"]
    ).withColumn("kw", F.lit("v"))
    req = SearchRequest(
        table="t",
        key_column="id",
        facets=[Facet(name="kw", kind="textual", value_cols=["kw"], query_value="v")],
        k=2,
    )
    responses = format_response(df, req, weights_used={0: {"kw": 1.0}})
    _StubHandler.responses["/sim/self"] = responses
    parsed = parse_simsearch_results(
        post_json(f"{stub_server}/sim/self", {}), "textual", "kw"
    )
    assert parsed == [("a", "v", 0.75), ("b", "v", 0.5)]


def test_parse_es_hits_spatial_nested_object_form():
    """Object-form geo-points under a NESTED path ('loc.point') must keep
    lon,lat axis order — the raw-_source probe has to walk the dotted path,
    not a single top-level get (ADVICE r6)."""
    hits = _es_hits(
        [
            {"id": "n", "loc": {"point": {"lon": 10.5, "lat": 20.25}}},
            {"id": "l", "loc": [{"point": {"lon": 33.0, "lat": 44.0}}]},
        ]
    )
    got = dict(parse_es_hits(hits, "spatial", "id", "loc.point"))
    assert got["n"] == (10.5, 20.25)
    assert got["l"] == (33.0, 44.0)


def test_simsearch_payload_caps_k_at_max_result_count():
    """The reference caps collectionSize at maxResultCount before building
    the federated request — the same cap as the ES path (ADVICE r6)."""
    from simsearch_spark.sources.rest import MAX_RESULT_COUNT, simsearch_search_payload

    payload = simsearch_search_payload("numerical", "price", 10.0, MAX_RESULT_COUNT + 500)
    assert payload["k"] == str(MAX_RESULT_COUNT)
    assert simsearch_search_payload("numerical", "price", 10.0, 5)["k"] == "5"


def test_parse_es_hits_spatial_literal_dotted_key():
    """ES allows LITERAL dotted field names: a raw _source like
    {"loc.point": {lon, lat}} has no 'loc' to walk, but flatten_source DOES
    find the object form under the joined key — the raw probe must check the
    literal spelling first or it swaps axes (ADVICE r7)."""
    hits = _es_hits([{"id": "d", "loc.point": {"lon": 7.5, "lat": 81.25}}])
    got = dict(parse_es_hits(hits, "spatial", "id", "loc.point"))
    assert got["d"] == (7.5, 81.25)
