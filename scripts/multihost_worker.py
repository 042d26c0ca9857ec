"""Two-process lockstep worker for MultiHostDriver (VERDICT r1 #9).

Launched once per process by tests/test_multihost_lockstep.py (and usable
by hand):

    python scripts/multihost_worker.py <pid> <nprocs> <port> <out.json> [mode]

Each process initializes ``jax.distributed`` over localhost with gloo CPU
collectives, builds the SAME tiny engine deterministically, and runs a
fixed number of lockstep rounds. Host 0 submits the requests and dumps its
completions; every host dumps its final slot token rows — identical
replicated state is the lockstep invariant (serve/multihost.py docstring).

``mode='sharded'`` (VERDICT r2 ask #4) gives each process 4 virtual CPU
devices and builds ``global_mesh(dp=2, tp=4)``: params megatron-sharded
over tp (within each process, the ICI analogue), serving slots sharded
over dp (ACROSS the two processes, the DCN analogue) — GSPMD collectives
demonstrably cross the process boundary, and host-side harvesting runs
through ``parallel.distributed.host_fetch`` collective gathers.
"""

import json
import os
import sys


def main():
    pid, nprocs, port, out_path = (
        int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
    mode = sys.argv[5] if len(sys.argv) > 5 else "replicated"
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["JAX_CPU_COLLECTIVES_IMPLEMENTATION"] = "gloo"
    if mode in ("sharded", "paged_sharded", "paged_driver"):
        os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import jax

    # the axon TPU plugin re-asserts JAX_PLATFORMS at import; force cpu
    # before the first backend touch or the distributed client never wires
    # into the CPU backend (process_count would stay 1)
    jax.config.update("jax_platforms", "cpu")
    dist_kw = {}
    if mode == "paged_kill":
        # the kill drill must exercise the DRIVER's failure detection:
        # park the coordination service's own watchdog far out so it
        # doesn't fatally terminate the surviving worker first
        dist_kw = dict(heartbeat_timeout_seconds=3600)
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=nprocs, process_id=pid, **dist_kw)
    assert jax.process_count() == nprocs, jax.process_count()

    import numpy as np

    from llmspeculativesampling_tpu.core.config import LlamaConfig
    from llmspeculativesampling_tpu.engine.types import ModelBundle
    from llmspeculativesampling_tpu.models import llama
    from llmspeculativesampling_tpu.serve.multihost import MultiHostDriver
    from llmspeculativesampling_tpu.serve.scheduler import ContinuousBatchingEngine

    mesh = None
    if mode in ("sharded", "paged_sharded", "paged_driver"):
        from llmspeculativesampling_tpu.parallel.distributed import global_mesh

        assert len(jax.devices()) == 4 * nprocs
        mesh = global_mesh(dp=2, tp=4)

    if mode == "paged_sharded":
        run_paged_sharded(pid, mesh, out_path)
        return
    if mode == "paged_driver":
        run_paged_driver(pid, mesh, out_path)
        return
    if mode == "paged_kill":
        run_paged_kill(pid, out_path)
        return

    engine, prompts = build_engine(mesh=mesh)
    driver = MultiHostDriver(engine, prompt_cap=64)
    rids = []
    if driver.is_primary:
        rids = [driver.submit(p, 8) for p in prompts]

    for _ in range(ROUNDS):
        driver.round()

    from llmspeculativesampling_tpu.parallel.distributed import host_fetch

    tokens = np.asarray(host_fetch(engine.state.spec.tokens))[:, 0]  # [S, T]
    out = {
        "process": pid,
        "token_rows": tokens.tolist(),
        "completions": {},
    }
    if driver.is_primary:
        for rid in rids:
            c = driver.result(rid)
            assert c is not None, f"rid {rid} incomplete after {ROUNDS} rounds"
            out["completions"][str(rid)] = c.output_ids.tolist()
    with open(out_path, "w") as f:
        json.dump(out, f)
    print(f"worker {pid} done", flush=True)


ROUNDS = 6


def run_paged_sharded(pid, mesh, out_path):
    """Cross-process dp x tp PAGED serving: each process drives the SAME
    deterministic PagedEngine over the 2-process mesh in lockstep — the
    dp shard_map splits rows/pool across the process boundary, and every
    host-side read (chunk metadata, harvest lanes) is a collective
    host_fetch both processes execute at the same point. Both hosts
    harvest identical completions (asserted by the test), because every
    host decision (admission order, allocator state, PRNG keys) is a
    deterministic function of the same submissions."""
    import json

    import numpy as np

    engine, prompts = build_paged_engine(mesh)
    rids = [engine.submit(p, 6) for p in prompts]
    engine.run_until_idle()
    out = {"process": pid, "completions": {}}
    for rid in rids:
        c = engine.result(rid)
        assert c is not None, f"rid {rid} incomplete"
        out["completions"][str(rid)] = c.output_ids.tolist()
    with open(out_path, "w") as f:
        json.dump(out, f)
    print(f"worker {pid} done", flush=True)


def run_paged_driver(pid, mesh, out_path):
    """PagedMultiHostDriver across two processes: host 0 owns the queue
    and releases requests in broadcast plans (batch_cap=2, so the
    release cadence itself is exercised); every host injects the
    identical stream and steps the dp x tp-sharded engine in lockstep."""
    import json

    from llmspeculativesampling_tpu.serve.multihost import PagedMultiHostDriver

    engine, prompts = build_paged_engine(mesh)
    driver = PagedMultiHostDriver(engine, prompt_cap=32, batch_cap=2)
    rids = []
    if driver.is_primary:
        rids = [driver.submit(p, 6) for p in prompts]
    driver.run_until_idle()
    out = {"process": pid, "completions": {}}
    # every host holds the identical completions (host 0 would answer
    # clients; the others drop theirs) — dump them all for the test
    ids = rids if driver.is_primary else list(range(len(prompts)))
    for rid in ids:
        c = driver.result(rid)
        assert c is not None, f"rid {rid} incomplete"
        out["completions"][str(rid)] = c.output_ids.tolist()
    with open(out_path, "w") as f:
        json.dump(out, f)
    print(f"worker {pid} done", flush=True)


KILL_AFTER_ROUNDS = 4
# the kill drill adds two more requests so queue + rows + staged states
# all hold work at the moment of failure (shared with the test's
# unfailed reference run)
EXTRA_PROMPTS = [list(range(90, 101)), list(range(110, 119))]


def run_paged_kill(pid, out_path):
    """Failure drill (VERDICT r4 ask #6 / SURVEY.md §5 'health-checked
    multi-host serving loop'): worker 1 dies mid-run after
    KILL_AFTER_ROUNDS lockstep rounds; worker 0 must DETECT the loss
    (per-round broadcast heartbeat -> WorkerLostError), REQUEUE all
    outstanding work (running rows preempted into resume Requests from
    the last harvested snapshot), and COMPLETE it on a fresh engine
    (deterministic rebuild = the reload-from-checkpoint analogue) with
    outputs matching an unfailed run."""
    import json

    from llmspeculativesampling_tpu.serve.multihost import (
        PagedMultiHostDriver, WorkerLostError,
    )

    engine, prompts = build_paged_engine()
    prompts = prompts + EXTRA_PROMPTS
    driver = PagedMultiHostDriver(engine, prompt_cap=32, batch_cap=2,
                                  heartbeat_timeout_s=30.0)
    rids = []
    if driver.is_primary:
        rids = [driver.submit(p, 16) for p in prompts]

    rounds = 0
    failed = False
    try:
        while rounds < 200:
            driver.round()
            rounds += 1
            if pid == 1 and rounds >= KILL_AFTER_ROUNDS:
                import os as _os

                print("worker 1 dying mid-run", flush=True)
                _os._exit(17)
            if driver.is_primary and not (
                    driver._more_queued or engine._pending
                    or engine.num_active or driver._queue):
                break
    except WorkerLostError as e:
        failed = True
        print(f"worker 0 detected peer loss after {rounds} rounds: {e}",
              flush=True)

    out = {"process": pid, "rounds": rounds, "detected_failure": failed,
           "completions": {}, "resumed_with_progress": 0}
    if driver.is_primary:
        assert failed, "worker 0 was meant to outlive worker 1 and detect it"
        recovered = driver.recover_requests()
        assert recovered, "outstanding work must be preserved"
        out["recovered_requests"] = len(recovered)
        out["resumed_with_progress"] = sum(
            1 for r in recovered if r.carry is not None)
        # completions harvested before the failure stay valid
        pre = {rid: engine.result(rid) for rid in rids}
        # fresh engine, deterministically rebuilt (= reload checkpoint)
        engine2, _ = build_paged_engine()
        for req in recovered:
            engine2.submit_request(req)
        engine2.run_until_idle()
        for rid in rids:
            c = pre.get(rid) or engine2.result(rid)
            assert c is not None, f"rid {rid} lost across the failure"
            out["completions"][str(rid)] = c.output_ids.tolist()
    with open(out_path, "w") as f:
        json.dump(out, f)
    print(f"worker {pid} done", flush=True)
    import os as _os

    # skip jax.distributed teardown: the shutdown barrier can never
    # complete with a dead peer and would turn a successful recovery
    # into a nonzero exit
    _os._exit(0)


def build_paged_engine(mesh=None):
    import jax

    from llmspeculativesampling_tpu.core.config import LlamaConfig
    from llmspeculativesampling_tpu.engine.types import ModelBundle
    from llmspeculativesampling_tpu.models import llama
    from llmspeculativesampling_tpu.serve.paged import PagedEngine

    cfg_t = LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128, num_layers=3,
        num_heads=8, num_kv_heads=8, max_position=128, dtype="float32")
    cfg_d = LlamaConfig(**{**cfg_t.__dict__, "num_layers": 1})
    pt = llama.init_params(cfg_t, jax.random.key(0))
    pd = {
        "embed": pt["embed"], "ln_final": pt["ln_final"],
        "lm_head": pt["lm_head"],
        "layers": jax.tree.map(lambda x: x[:1], pt["layers"]),
    }
    engine = PagedEngine(
        ModelBundle("llama", cfg_d, llama.forward), pd,
        ModelBundle("llama", cfg_t, llama.forward), pt,
        batch_rows=4, num_blocks=16, page=32, max_pages_per_req=4,
        max_new_cap=16, gamma=2, eos_token_id=-1, temperature=1.0,
        top_k=10, top_p=0.9, seed=7, prompt_bucket=16, steps_per_sync=2,
        mesh=mesh)
    prompts = [list(range(5, 15)), list(range(30, 42)),
               list(range(50, 61)), list(range(70, 79))]
    return engine, prompts


def build_engine(mesh=None):
    """Deterministic tiny engine + the canonical prompt set (shared with
    the in-process single-host reference run in the test)."""
    import jax

    from llmspeculativesampling_tpu.core.config import LlamaConfig
    from llmspeculativesampling_tpu.engine.types import ModelBundle
    from llmspeculativesampling_tpu.models import llama
    from llmspeculativesampling_tpu.serve.scheduler import ContinuousBatchingEngine

    cfg_t = LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128, num_layers=3,
        num_heads=8, num_kv_heads=8, max_position=128, dtype="float32")
    cfg_d = LlamaConfig(**{**cfg_t.__dict__, "num_layers": 1})
    pt = llama.init_params(cfg_t, jax.random.key(0))
    pd = {
        "embed": pt["embed"], "ln_final": pt["ln_final"],
        "lm_head": pt["lm_head"],
        "layers": jax.tree.map(lambda x: x[:1], pt["layers"]),
    }
    engine = ContinuousBatchingEngine(
        ModelBundle("llama", cfg_d, llama.forward), pd,
        ModelBundle("llama", cfg_t, llama.forward), pt,
        num_slots=2, max_total_len=64, max_new_cap=16, gamma=2,
        eos_token_id=-1, temperature=1.0, top_k=10, top_p=0.9, seed=7,
        prompt_bucket=16, steps_per_sync=2, mesh=mesh)
    prompts = [list(range(5, 15)), list(range(30, 42))]
    return engine, prompts


if __name__ == "__main__":
    main()
