"""Subprocess runner for the 2-process (multi-host style) DP training test.

Invoked by tests/test_multihost.py. Two modes build identical inputs and run
ONE data-parallel training step over a 2-device mesh:

  --mode single : one process, 2 virtual CPU devices (the reference result)
  --mode multi  : two processes x 1 CPU device each, rendezvoused through
                  jax.distributed (`parallel.mesh.initialize_distributed`,
                  the DCN bring-up path of SURVEY.md §2.3)

Process 0 writes {loss, param leaf sums} to --out; grads ride the same psum
either way, so the results must match to float tolerance.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["single", "multi"], required=True)
    ap.add_argument("--process-id", type=int, default=0)
    ap.add_argument("--num-processes", type=int, default=2)
    ap.add_argument("--coordinator", default="localhost:9876")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")
    n_local = 2 if args.mode == "single" else 1
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "").replace(
            "--xla_force_host_platform_device_count=8", "")
        + f" --xla_force_host_platform_device_count={n_local}"
    )

    import jax

    # the axon site hook re-forces the TPU platform; override the config
    # directly (same pattern as tests/conftest.py)
    jax.config.update("jax_platforms", "cpu")

    if args.mode == "multi":
        from imfnet_tpu.parallel.mesh import initialize_distributed

        initialize_distributed(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )
        # establish the gloo context while the processes are still aligned
        # (startup skew is seconds; post-compile skew can exceed gloo's 30 s
        # connect/KV timeout on a contended host)
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("gloo-bringup")

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from imfnet_tpu.config import threedmatch_config
    from imfnet_tpu.data.synthetic import synthetic_batch
    from imfnet_tpu.models import load_model
    from imfnet_tpu.parallel import make_mesh, make_parallel_train_step
    from imfnet_tpu.parallel.mesh import DP_AXIS
    from imfnet_tpu.sparse.coords import SparseVoxels
    from imfnet_tpu.sparse.kernel_map import build_pyramid
    from imfnet_tpu.train.state import create_train_state, make_optimizer
    from imfnet_tpu.train.step import level_capacities

    assert jax.device_count() == 2, jax.devices()

    config = threedmatch_config(
        batch_size=1, conv1_kernel_size=3, model_n_out=8,
        num_pos_per_batch=32, num_hn_samples_per_batch=16,
        max_points=512, compute_dtype="float32",
    )
    model = load_model(config.model)(
        in_channels=1, out_channels=8, conv1_kernel_size=3,
        normalize_feature=True, compute_dtype=jnp.float32,
    )
    # both processes build BOTH shards deterministically; each contributes
    # its own row to the global stacked batch
    batches = [
        synthetic_batch(np.random.RandomState(100 + d), 1, 200,
                        config.max_points, image_hw=(24, 32))
        for d in range(2)
    ]
    sv = SparseVoxels(batches[0].coords0, batches[0].feats0, batches[0].n0)
    pyr = build_pyramid(batches[0].coords0, batches[0].n0,
                        conv1_kernel_size=3,
                        level_capacity=level_capacities(config.max_points))
    variables = model.init(jax.random.PRNGKey(0), sv, pyr, batches[0].image0,
                           train=False)
    tx = make_optimizer(config, steps_per_epoch=10)
    state = create_train_state(variables, tx)

    mesh = make_mesh()           # global devices (2 in both modes)
    shard = NamedSharding(mesh, P(DP_AXIS))
    repl = NamedSharding(mesh, P())

    def to_global_stacked(*rows):
        """Stack per-device rows into a global array sharded over DP_AXIS."""
        full = np.stack([np.asarray(r) for r in rows])
        if args.mode == "single":
            return jax.device_put(jnp.asarray(full), shard)
        local = full[args.process_id: args.process_id + 1]
        return jax.make_array_from_process_local_data(shard, local,
                                                      global_shape=full.shape)

    def to_replicated(x):
        x = np.asarray(x)
        if args.mode == "single":
            return jax.device_put(jnp.asarray(x), repl)
        return jax.make_array_from_process_local_data(repl, x,
                                                      global_shape=x.shape)

    stacked = jax.tree_util.tree_map(
        lambda *xs: (to_global_stacked(*xs) if xs[0] is not None else None),
        *batches)
    keys_full = [np.asarray(jax.random.PRNGKey(42))] * 2
    keys = to_global_stacked(*keys_full)
    state = jax.tree_util.tree_map(to_replicated, state)

    pstep = make_parallel_train_step(model, tx, config, mesh)
    # AOT-compile BEFORE the first collective: on a contended host the two
    # processes' trace+compile times skew by minutes, and gloo's context
    # bring-up (KV lookup + TCP connect, triggered lazily by the first
    # executed collective) times out after 30 s if the peer is still
    # compiling. Compile is pure-local; the barrier then aligns execution.
    compiled = pstep.lower(state, stacked, keys).compile()
    if args.mode == "multi":
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("compiled")
    state2, metrics = compiled(state, stacked, keys)

    loss = float(np.asarray(metrics["loss"].addressable_data(0)))
    leaves = jax.tree_util.tree_leaves(state2.params)
    sums = [float(np.asarray(jnp.sum(leaf).addressable_data(0)))
            for leaf in leaves]

    # one sharded batch-of-pairs registration step over the same global mesh
    # (the eval-throughput path of SURVEY.md §2.3) — must also be
    # process-topology-invariant
    from imfnet_tpu.geom.transforms import sample_random_trans
    from imfnet_tpu.parallel.dp import make_parallel_registration

    K = 128
    kp0s, kd0s, kp1s, kd1s, Ts = [], [], [], [], []
    for d in range(2):
        r = np.random.RandomState(200 + d)
        src = r.rand(K, 3).astype(np.float32) * 2
        T = sample_random_trans(src, r).astype(np.float32)
        dst = src @ T[:3, :3].T + T[:3, 3]
        desc = r.randn(K, 16).astype(np.float32)
        kp0s.append(src); kp1s.append(dst)
        kd0s.append(desc); kd1s.append(desc + r.randn(K, 16).astype(np.float32) * 1e-3)
        Ts.append(np.linalg.inv(T))
    ok_rows = [np.ones((K,), bool)] * 2
    reg_keys = [np.asarray(jax.random.PRNGKey(500 + d)) for d in range(2)]
    covs = [np.eye(6, dtype=np.float32)] * 2
    reg_args = tuple(
        to_global_stacked(*rows)
        for rows in (reg_keys, kp0s, kd0s, ok_rows, kp1s, kd1s, ok_rows,
                     Ts, covs)
    )
    par_reg = make_parallel_registration(mesh, voxel_size=0.05,
                                         num_hypotheses=2048)
    reg_compiled = par_reg.lower(*reg_args).compile()
    if args.mode == "multi":
        multihost_utils.sync_global_devices("reg-compiled")
    reg_out = reg_compiled(*reg_args)
    # each process addresses its own shard; all-gather the metric rows so
    # process 0 records the global result
    rr = np.asarray(jax.experimental.multihost_utils.process_allgather(
        reg_out["rr"], tiled=True)) if args.mode == "multi" else \
        np.asarray(reg_out["rr"])
    ir = np.asarray(jax.experimental.multihost_utils.process_allgather(
        reg_out["ir"], tiled=True)) if args.mode == "multi" else \
        np.asarray(reg_out["ir"])

    if args.process_id == 0:
        np.savez(args.out, loss=loss, sums=np.array(sums), rr=rr, ir=ir)
        print("OK", loss)
    return 0


if __name__ == "__main__":
    sys.exit(main())
