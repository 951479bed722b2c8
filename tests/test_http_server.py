"""HTTP front-end e2e: the reference's smoke shape (app/test/test.go:18-35)
plus routes/headers/metrics (app/app.go:66-117, actions/routes.go:36-46)."""

import json
import urllib.error
import urllib.parse
import urllib.request

import pytest

from lighthouse_ray.config import IndexConfig
from lighthouse_ray.corpus import gen_corpus

CFG = IndexConfig(num_doc_parts=8, num_term_shards=16, salt_range=64, df_sample_mod=10)


@pytest.fixture(scope="module")
def server(ray_session, tmp_path_factory):
    import ray.data as rd

    from lighthouse_ray.build import build_index
    from lighthouse_ray.query.http_server import LighthouseHTTPServer

    idx = str(tmp_path_factory.mktemp("http") / "index")
    build_index(rd.from_arrow(gen_corpus(250)), idx, CFG)
    srv = LighthouseHTTPServer(idx, port=0, num_replicas=1).start()
    yield srv
    srv.stop()


def _get(srv, path):
    url = f"http://127.0.0.1:{srv.port}{path}"
    with urllib.request.urlopen(url, timeout=30) as r:
        return r.status, dict(r.headers), r.read()


def test_search_smoke_shape(server):
    """The reference e2e asserts a JSON array of {name, claimId}
    (test.go:12-15,30); score is excluded unless requested."""
    q = urllib.parse.quote("merge segment")
    status, headers, body = _get(server, f"/search?s={q}&size=3")
    assert status == 200
    assert headers["Access-Control-Allow-Origin"] == "*"
    assert headers["X-Content-Type-Options"] == "nosniff"
    results = json.loads(body)
    assert isinstance(results, list) and len(results) >= 1
    assert set(results[0].keys()) == {"name", "claimId"}

    # parity with the engine through the replica + HTTP layers
    status, _h, body2 = _get(server, f"/search?s={q}&size=3&score=true")
    withscore = json.loads(body2)
    assert [r["claimId"] for r in withscore] == [r["claimId"] for r in results]
    assert all("score" in r for r in withscore)


def test_search_params_and_validation(server):
    status, _h, body = _get(server, "/search?s=merge+segment&size=2&from=1&resolve=true")
    rows = json.loads(body)
    assert status == 200 and len(rows) <= 2
    assert "channel" in rows[0] and "title" in rows[0]  # resolve columns

    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(server, "/search?s=ab")  # length < 3 (search.go:57)
    assert ei.value.code == 400
    assert "error" in json.loads(ei.value.read())

    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(server, "/search?s=merge+segment&size=20000")  # size > 10000
    assert ei.value.code == 400

    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(server, "/nope")
    assert ei.value.code == 404


def test_autocomplete_and_status_routes(server):
    status, _h, body = _get(server, "/autocomplete?s=imp&size=5")
    names = json.loads(body)
    assert status == 200 and isinstance(names, list)

    status, _h, body = _get(server, "/status")
    st = json.loads(body)
    assert status == 200 and st["count"] > 0

    status, _h, body = _get(server, "/")
    assert json.loads(body) == "Welcome to Lighthouse!"
    status, _h, body = _get(server, "/test")
    assert json.loads(body) == "ok"


def test_metrics_exposition(server):
    # the requests above must be counted; errors too
    status, headers, body = _get(server, "/metrics")
    assert status == 200
    text = body.decode()
    assert "lighthouse_search_errors" in text
    assert 'lighthouse_request_count{path="/search"}' in text
    assert "lighthouse_request_duration_seconds_sum" in text
    # error counter reflects the 400/404s driven earlier
    errline = [l for l in text.splitlines() if l.startswith("lighthouse_search_errors ")][0]
    assert int(errline.split()[-1]) >= 3


def test_msearch_bulk_endpoint(server):
    """POST /msearch (ES _msearch analog): NDJSON body with an ES-style
    header line, two valid searches and one invalid — per-item error
    isolation, parity with the equivalent GET /search results."""
    srv = server
    body = "\n".join([
        "{}",                                   # ES header line, skipped
        json.dumps({"s": "import", "size": 3}),
        json.dumps({"s": "merge segment", "size": 2, "score": True}),
        json.dumps({"size": 5}),                # invalid: s is required
    ])
    req = urllib.request.Request(
        f"http://127.0.0.1:{srv.port}/msearch",
        data=body.encode(),
        headers={"Content-Type": "application/x-ndjson"},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=60) as r:
        out = json.loads(r.read())
    rs = out["responses"]
    assert len(rs) == 3
    assert rs[0]["status"] == 200 and len(rs[0]["hits"]) == 3
    assert rs[1]["status"] == 200 and len(rs[1]["hits"]) == 2
    assert all("score" in h for h in rs[1]["hits"])      # score=True kept
    assert all("score" not in h for h in rs[0]["hits"])  # default dropped
    assert rs[2]["status"] == 400 and "required" in rs[2]["error"]

    # parity with the single-search route
    single = json.loads(urllib.request.urlopen(
        f"http://127.0.0.1:{srv.port}/search?"
        + urllib.parse.urlencode({"s": "import", "size": 3}), timeout=60).read())
    assert rs[0]["hits"] == single

    # empty body is a top-level 400
    req = urllib.request.Request(
        f"http://127.0.0.1:{srv.port}/msearch", data=b"\n",
        method="POST")
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req, timeout=30)
    assert ei.value.code == 400


def test_post_unknown_path_and_bad_json(server):
    srv = server
    req = urllib.request.Request(
        f"http://127.0.0.1:{srv.port}/search", data=b"{}", method="POST")
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req, timeout=30)
    assert ei.value.code == 404  # POST is only /msearch
    req = urllib.request.Request(
        f"http://127.0.0.1:{srv.port}/msearch", data=b"not json\n", method="POST")
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req, timeout=30)
    assert ei.value.code == 400
