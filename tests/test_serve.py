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


def test_recurrent_serving_roundtrip(tmp_path):
    """gru family: client-held hidden state round-trips through /act."""
    import jax

    import serve as S
    from http.server import ThreadingHTTPServer

    from marl_traffic_intersection_tpu.models import RecurrentActorCritic
    from marl_traffic_intersection_tpu.utils.checkpoint import save_checkpoint

    model = RecurrentActorCritic()  # make_policy builds the default sizes
    import jax.numpy as jnp
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 127)),
                        model.initial_hidden(1))
    save_checkpoint(str(tmp_path / "gru_ckpt"), {"params": params,
                                                 "opt_state": {}, "update": 0})

    port = _free_port()
    prev_act = S.Handler.__dict__.get("act")  # restore for the shared fixture
    S.Handler.act = staticmethod(
        S.make_policy(str(tmp_path / "gru_ckpt"), "gru", max_batch=8))
    httpd = ThreadingHTTPServer(("127.0.0.1", port), S.Handler)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        obs = np.random.RandomState(0).uniform(
            0, 1, (2, 127)).astype(np.float32).tolist()
        out1 = _post(port, {"obs": obs})                 # no h -> zeros
        assert np.asarray(out1["actions"]).shape == (2, 2)
        h1 = out1["h"]
        assert np.asarray(h1).shape == (2, model.gru)
        out2 = _post(port, {"obs": obs, "h": h1})        # state carried
        # the carried hidden state evolves (memory round-trips)
        assert not np.allclose(np.asarray(h1), np.asarray(out2["h"]))
        assert np.all(np.abs(np.asarray(out2["actions"])) <= 1.0)
        # malformed h -> 400, not a dead handler thread
        try:
            _post(port, {"obs": obs, "h": [[0.0, 0.0]]})
            assert False, "expected 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        httpd.shutdown()
        S.Handler.act = prev_act


def test_healthz(server):
    with urllib.request.urlopen(f"http://127.0.0.1:{server}/healthz",
                                timeout=10) as r:
        assert json.loads(r.read())["ok"] is True
