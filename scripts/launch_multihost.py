"""Multi-host (multi-process) training launcher.

TPU analog of the reference's single-node SLURM launch (slurmtask.sh:10-13 +
nn.DataParallel): on TPU pods, one identical process runs per host;
jax.distributed.initialize() wires them up over DCN, the GSPMD train step is
unchanged, and each process feeds its local slice of the global batch via
parallel.mesh.shard_host_local_batch (jax.make_array_from_process_local_data).

On a Cloud TPU pod slice the coordinator is discovered automatically:

    gcloud compute tpus tpu-vm ssh $TPU --worker=all -- \
        python scripts/launch_multihost.py --model context_app_v2 \
            --dataset coco --batch_size 128 ...

Under SLURM (one task per host), jax.distributed.initialize also
auto-detects from SLURM env vars:

    srun --ntasks-per-node=1 python scripts/launch_multihost.py ...

All flags after the launcher's own are passed through to
layout2img_tpu.cli.train. --batch_size is the PER-PROCESS batch; the global
batch is batch_size * process_count.

For a local 2-process CPU smoke test (no TPU pod needed), see
tests/test_multihost.py, which drives exactly this entry point.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser(add_help=False)
    p.add_argument("--coordinator_address", default=None,
                   help="host:port of process 0 (auto-detected on TPU pods/SLURM)")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    p.add_argument("--local_device_count", type=int, default=0,
                   help="force N virtual CPU devices per process (testing)")
    args, train_argv = p.parse_known_args(argv)

    if args.local_device_count:
        import jax

        flags = os.environ.get("XLA_FLAGS", "")
        os.environ["XLA_FLAGS"] = (
            f"{flags} --xla_force_host_platform_device_count={args.local_device_count}"
        ).strip()
        jax.config.update("jax_platforms", "cpu")

    import jax

    kwargs = {}
    if args.coordinator_address is not None:
        kwargs = dict(
            coordinator_address=args.coordinator_address,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )
    jax.distributed.initialize(**kwargs)
    print(f"[multihost] process {jax.process_index()}/{jax.process_count()}: "
          f"{len(jax.local_devices())} local / {len(jax.devices())} global devices",
          flush=True)

    from layout2img_tpu.cli.train import main as train_main

    train_main(train_argv)


if __name__ == "__main__":
    main()
