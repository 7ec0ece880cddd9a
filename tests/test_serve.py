"""Policy inference server: drive over a real socket."""
import json
import pathlib
import socket
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

_ART = pathlib.Path(__file__).resolve().parent.parent / "artifacts" / "policy_mlp_cfg1"


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def server():
    if not _ART.exists():
        pytest.skip("no artifact")
    import serve as S

    port = _free_port()
    S.Handler.act = staticmethod(S.make_policy(str(_ART), max_batch=32))
    from http.server import ThreadingHTTPServer

    httpd = ThreadingHTTPServer(("127.0.0.1", port), S.Handler)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield port
    httpd.shutdown()


def _post(port, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/act", data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=30) as r:
        return json.loads(r.read())


def test_act_endpoint(server):
    obs = np.zeros((3, 127), np.float32).tolist()
    out = _post(server, {"obs": obs})
    a = np.asarray(out["actions"])
    assert a.shape == (3, 2)
    assert (np.abs(a) <= 1.0).all()


def test_act_oversized_batch_chunks(server):
    obs = np.zeros((70, 127), np.float32).tolist()  # > max_batch=32
    out = _post(server, {"obs": obs})
    assert np.asarray(out["actions"]).shape == (70, 2)


def test_act_bad_shape_400(server):
    try:
        _post(server, {"obs": [[1.0, 2.0]]})
        assert False, "expected 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400
        assert "127" in json.loads(e.read())["error"]


def test_healthz(server):
    with urllib.request.urlopen(f"http://127.0.0.1:{server}/healthz",
                                timeout=10) as r:
        assert json.loads(r.read())["ok"] is True
