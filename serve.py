"""Policy inference server: batch observations in, actions out.

Minimal production-serving surface for trained policies (stdlib HTTP, no extra
deps): a jitted forward pass with a fixed max batch (pad-and-slice, so one
compiled program serves any request size).

  python serve.py --checkpoint artifacts/policy_mlp_cfg1 --port 8787
  curl -X POST localhost:8787/act -d '{"obs": [[...127 floats...]]}'
    -> {"actions": [[throttle, steer], ...]}
  GET /healthz -> {"ok": true, ...}
"""
from __future__ import annotations

import argparse
import json
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


def make_policy(checkpoint: str, model_kind: str = "mlp", max_batch: int = 256,
                deterministic: bool = True):
    """Returns act(obs, h=None) -> (actions, h_new_or_None).

    The recurrent (gru) family is served stateless-server / stateful-client:
    the client holds its hidden state and sends it back with each request
    (scales to any number of concurrent control sessions without server-side
    session affinity).
    """
    import jax
    import jax.numpy as jnp

    from marl_traffic_intersection_tpu.utils.checkpoint import load_policy

    model, params, mean_fn = load_policy(checkpoint, model_kind)
    recurrent = model_kind == "gru"
    h_dim = model.gru if recurrent else 0

    if recurrent:
        @jax.jit
        def fwd(obs, h):
            mean, log_std, value, h2 = model.apply(params, obs, h)
            return jnp.tanh(mean), h2

        fwd(jnp.zeros((max_batch, 127), jnp.float32),
            jnp.zeros((max_batch, h_dim), jnp.float32))
    else:
        @jax.jit
        def fwd(obs):
            return jnp.tanh(mean_fn(params, obs))

        # warm up the fixed-shape program
        fwd(jnp.zeros((max_batch, 127), jnp.float32))

    def act(obs: np.ndarray, h: np.ndarray = None):
        n = obs.shape[0]
        if n > max_batch:
            parts = [act(obs[i:i + max_batch],
                         None if h is None else h[i:i + max_batch])
                     for i in range(0, n, max_batch)]
            acts = np.concatenate([p[0] for p in parts])
            hs = np.concatenate([p[1] for p in parts]) if recurrent else None
            return acts, hs
        padded = np.zeros((max_batch, 127), np.float32)
        padded[:n] = obs
        if recurrent:
            hp = np.zeros((max_batch, h_dim), np.float32)
            if h is not None:
                hp[:n] = h
            actions, h2 = fwd(padded, hp)
            return np.asarray(actions)[:n], np.asarray(h2)[:n]
        actions = fwd(padded)
        return np.asarray(actions)[:n], None

    act.h_dim = h_dim  # 0 for feedforward families; used for /act validation
    return act


class Handler(BaseHTTPRequestHandler):
    act = None  # set by serve()
    served = 0

    def log_message(self, *a):  # quiet
        pass

    def _reply(self, code: int, payload: dict):
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        if self.path == "/healthz":
            self._reply(200, {"ok": True, "served": Handler.served})
        else:
            self._reply(404, {"error": "unknown path"})

    def do_POST(self):
        if self.path != "/act":
            return self._reply(404, {"error": "unknown path"})
        try:
            length = int(self.headers.get("Content-Length", 0))
            req = json.loads(self.rfile.read(length))
            obs = np.asarray(req["obs"], np.float32)
            if obs.ndim == 1:
                obs = obs[None]
            if obs.ndim != 2 or obs.shape[1] != 127:
                return self._reply(400, {"error": f"obs must be (N, 127), got {list(obs.shape)}"})
            h = req.get("h")
            if h is not None:
                h = np.asarray(h, np.float32)
                h_dim = getattr(Handler.act, "h_dim", 0)
                expect = (obs.shape[0], h_dim)
                if h_dim == 0:
                    return self._reply(400, {"error": "h given but the served "
                                                      "model is not recurrent"})
                if h.shape != expect:
                    return self._reply(400, {"error": f"h must be {list(expect)}, "
                                                      f"got {list(h.shape)}"})
        except (KeyError, ValueError, json.JSONDecodeError) as e:
            return self._reply(400, {"error": f"bad request: {e}"})
        actions, h_new = Handler.act(obs, h)
        Handler.served += obs.shape[0]
        payload = {"actions": actions.tolist()}
        if h_new is not None:  # recurrent family: client carries its state
            payload["h"] = h_new.tolist()
        self._reply(200, payload)


def serve(checkpoint: str, port: int, model_kind: str = "mlp",
          max_batch: int = 256):
    Handler.act = staticmethod(make_policy(checkpoint, model_kind, max_batch))
    httpd = ThreadingHTTPServer(("127.0.0.1", port), Handler)
    print(f"serving policy on :{port} (max_batch={max_batch})", flush=True)
    httpd.serve_forever()


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--port", type=int, default=8787)
    ap.add_argument("--model",
                    choices=["mlp", "attention", "conv", "gru", "central",
                             "sac"],
                    default="mlp")
    ap.add_argument("--max-batch", type=int, default=256)
    args = ap.parse_args()
    serve(args.checkpoint, args.port, args.model, args.max_batch)
