"""Worker for the 2-process multi-host engine test: each process drives 4
virtual CPU devices, hosts a MultiHostEngine over the global 2x4 mesh, and
serves its own disjoint streams. Logit-level agreement with the
single-process engine is asserted by comparing generated token strings.

Usage: python worker.py <process_id> <num_processes> <port> <out_json>
"""

import json
import os
import sys
import tempfile

pid, nproc, port, out_path = (
    int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)
jax.distributed.initialize(
    f"127.0.0.1:{port}", num_processes=nproc, process_id=pid
)

import jax.numpy as jnp

from llm_tpu.loader import ModelParameters, load
from llm_tpu.parallel.sharding import MeshConfig, make_mesh
from llm_tpu.parallel.multihost import MultiHostEngine
from llm_tpu.samplers import DeterministicSampler
from llm_tpu.serve import GenerationRequest
from llm_tpu.testing import make_tiny_file

assert jax.process_count() == nproc and jax.device_count() == 4 * nproc

# every host loads the same (deterministic) checkpoint
path = os.path.join(tempfile.mkdtemp(), "llama.bin")
make_tiny_file("llama", path)
model = load(path, "llama", params=ModelParameters(context_size=64))

mesh = make_mesh(MeshConfig(data=nproc, model=4))
engine = MultiHostEngine(
    model, mesh, global_streams=2 * nproc, kv_dtype=jnp.float32, n_batch=4
)
assert engine.max_streams == 2  # two local slots per host

# disjoint per-host prompts; host 1's second prompt is LONG so its chunked
# prefill interleaves with host 0's decode across the coordinated steps
prompts = {
    0: [[2, 3], [9, 4, 5]],
    1: [[7, 8], [5, 6] * 8],
}[pid]
texts = engine.generate_all(
    [
        GenerationRequest(
            prompt=p, max_tokens=8, sampler=DeterministicSampler()
        )
        for p in prompts
    ]
)
out = {str(i): t for i, t in enumerate(texts.values())}

# phase 2: on-device multi-token decode across hosts (greedy; must equal
# the single-process reference the parent computes)
from llm_tpu.ops.sampling import DeviceSampler

engine2 = MultiHostEngine(
    model, mesh, global_streams=2 * nproc, kv_dtype=jnp.float32, n_batch=4
)
ids2 = [
    engine2.submit(
        GenerationRequest(prompt=p, max_tokens=8,
                          device_sampler=DeviceSampler.greedy())
    )
    for p in prompts
]
while engine2.has_work_global():
    engine2.step_multi(4)
multi = {str(i): "".join(engine2.finished[r].text) for i, r in enumerate(ids2)}

# phase 3: host-local paged KV pools (pool page axis sharded over `data`,
# page tables host-local, manual-`data` shard_map dispatch)
from llm_tpu.parallel.multihost import MultiHostPagedEngine

engine3 = MultiHostPagedEngine(
    model, mesh, global_streams=2 * nproc, kv_dtype=jnp.bfloat16,
    n_batch=4, page_size=8,
)
texts3 = engine3.generate_all(
    [
        GenerationRequest(
            prompt=p, max_tokens=8, sampler=DeterministicSampler()
        )
        for p in prompts
    ]
)
paged = {str(i): t for i, t in enumerate(texts3.values())}

# phase 5: per-host engine checkpoint/resume — a MultiHostPagedEngine is
# checkpointed mid-flight (each host writes ONLY its addressable pool
# slice + local streams to its own file, no collective), restored into a
# fresh engine on the same layout, and must finish with exactly the
# phase-3 texts. Genuinely distributed: each host's local block here is a
# PARTIAL row range of the global pool.
from llm_tpu.engine_snapshot import read_engine, write_engine

engine5 = MultiHostPagedEngine(
    model, mesh, global_streams=2 * nproc, kv_dtype=jnp.bfloat16,
    n_batch=4, page_size=8,
)
for p in prompts:
    engine5.submit(
        GenerationRequest(prompt=p, max_tokens=8,
                          sampler=DeterministicSampler())
    )
for _ in range(3):  # both hosts step in lockstep, then quiesce
    engine5.step()
ckpt_path = os.path.join(tempfile.mkdtemp(), f"host{pid}.ckpt")
write_engine(engine5, ckpt_path)

engine6 = MultiHostPagedEngine(
    model, mesh, global_streams=2 * nproc, kv_dtype=jnp.bfloat16,
    n_batch=4, page_size=8,
)
read_engine(engine6, ckpt_path)
while engine6.has_work_global():
    engine6.step()
ckpt = {
    str(i): "".join(engine6.finished[r].text)
    for i, r in enumerate(sorted(engine6.finished))
}

# phase 4: HTTP front-end per host over the cross-host engine — each host
# binds its own port and serves its own clients, while the collective
# per-host loop (server._MultiHostEngineLoop) keeps every host stepping
# until the GLOBAL queue drains and all hosts have requested shutdown.
import urllib.request

from llm_tpu.server import LlmServer

engine4 = MultiHostEngine(
    model, mesh, global_streams=2 * nproc, kv_dtype=jnp.float32, n_batch=4
)
srv = LlmServer(model, engine4, host="127.0.0.1", port=0)
srv.start()
hhost, hport = srv.address


def post(prompt):
    req = urllib.request.Request(
        f"http://{hhost}:{hport}/v1/completions",
        data=json.dumps({"prompt": prompt, "max_tokens": 8,
                         "temperature": 0}).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=240) as r:
        return json.loads(r.read())["choices"][0]["text"]


http_out = {str(i): post(p) for i, p in enumerate(prompts)}
srv.loop.shutdown()
srv.loop.join(timeout=120)
assert not srv.loop.is_alive(), "multihost loop failed to reach consensus"
srv.httpd.shutdown()

with open(out_path, "w") as f:
    json.dump({"pid": pid, "texts": out, "multi": multi, "paged": paged,
               "ckpt": ckpt, "http": http_out}, f)
print(f"[{pid}] done", flush=True)
