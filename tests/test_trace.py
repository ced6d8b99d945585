import json
import time

from mysteryann_tpu.utils.trace import Tracer


def test_span_and_counters(tmp_path):
    tr = Tracer()
    with tr.span("outer", queries=5):
        time.sleep(0.01)
        tr.count("cmps", 42)
        tr.count("cmps", 8)
    tr.record("phase", 1.5, nodes=100)
    s = tr.summary()
    assert s["spans"]["outer"]["n"] == 1
    assert s["spans"]["outer"]["total_s"] >= 0.01
    assert s["spans"]["phase"]["total_s"] == 1.5
    assert s["counters"]["cmps"] == 50
    p = str(tmp_path / "t.jsonl")
    tr.dump(p)
    lines = [json.loads(l) for l in open(p)]
    assert lines[0]["name"] == "outer" and lines[0]["queries"] == 5
    assert lines[-1]["counters"]["cmps"] == 50
    tr.reset()
    assert tr.events == [] and tr.counters == {}


def test_build_emits_trace():
    import numpy as np
    from mysteryann_tpu.utils.trace import tracer
    from mysteryann_tpu.io import make_cross_modal
    from mysteryann_tpu.ops import exact_knn
    from mysteryann_tpu.graph import build_roargraph
    from mysteryann_tpu.utils.params import BuildConfig

    tracer().reset()
    base, train = make_cross_modal(800, 400, 16, metric="ip", seed=81)
    _, knn = exact_knn(train, base, k=8, metric="ip")
    cfg = BuildConfig(M_sq=8, M_pjbp=6, L_pjpq=16, metric="ip",
                      query_batch=256, search_batch=256,
                      connectivity_iters=2)
    build_roargraph(base, train, knn, cfg, verbose=False)
    names = {e["name"] for e in tracer().events}
    assert {"build.medoid", "build.phaseA", "build.phaseBC",
            "build.phaseD"} <= names
