#!/usr/bin/env python3
"""Training CLI (reference train.py:316-353 interface).

Usage:
    python train.py -s <data_dir> -m <output_dir> --bind_to_mesh --eval ...
"""

import sys
from argparse import ArgumentParser

import gaussianavatars_tpu.utils.jax_setup  # noqa: F401  (compile cache)
from gaussianavatars_tpu.config import (
    ModelConfig,
    OptimizationConfig,
    PipelineConfig,
)


def main(argv=None):
    parser = ArgumentParser(description="Training script parameters")
    ModelConfig.add_to_parser(parser)
    OptimizationConfig.add_to_parser(parser)
    PipelineConfig.add_to_parser(parser)
    parser.add_argument("--ip", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=6009)
    parser.add_argument("--detect_anomaly", action="store_true", default=False)
    parser.add_argument("--debug_from", type=int, default=-1,
                        help="arm the renderer debug snapshot (dump state "
                             "on non-finite loss) from this iteration on "
                             "(reference train.py --debug_from)")
    parser.add_argument(
        "--interval", type=int, default=60_000,
        help="shared iteration interval for test/save/checkpoint",
    )
    parser.add_argument("--test_iterations", nargs="+", type=int, default=[])
    parser.add_argument("--save_iterations", nargs="+", type=int, default=[])
    parser.add_argument("--checkpoint_iterations", nargs="+", type=int,
                        default=[])
    parser.add_argument("--start_checkpoint", type=str, default=None)
    parser.add_argument("--quiet", action="store_true")
    parser.add_argument("--no_gui", action="store_true",
                        help="disable the network GUI server")
    parser.add_argument("--profile_dir", type=str, default=None,
                        help="write a jax.profiler trace here (xprof format)")
    parser.add_argument("--distributed", action="store_true",
                        help="initialize jax.distributed (multi-host pods)")
    args = parser.parse_args(argv)

    if args.interval > args.iterations:
        args.interval = args.iterations // 5
    schedule = list(range(args.interval, args.iterations + 1, args.interval))
    if not args.test_iterations:
        args.test_iterations = schedule
    if not args.save_iterations:
        args.save_iterations = schedule
    if not args.checkpoint_iterations:
        args.checkpoint_iterations = schedule

    import jax

    if args.distributed:
        from gaussianavatars_tpu.parallel.distributed import (
            initialize_distributed,
        )

        initialize_distributed()
    if args.detect_anomaly:
        jax.config.update("jax_debug_nans", True)

    model_cfg = ModelConfig.extract(args)
    opt_cfg = OptimizationConfig.extract(args)
    pipe_cfg = PipelineConfig.extract(args)

    print("Optimizing " + model_cfg.model_path)

    # seeded RNG + timestamped stdout (reference train.py:345)
    from gaussianavatars_tpu.utils.system import safe_state

    safe_state(args.quiet)

    tb_writer = None
    try:
        from tensorboardX import SummaryWriter

        tb_writer = SummaryWriter(model_cfg.model_path)
    except ImportError:
        print("tensorboardX not available: not logging progress")

    gui = None
    if not args.no_gui:
        from gaussianavatars_tpu.viewer.network_gui import NetworkGUI

        gui = NetworkGUI(args.ip, args.port)
        try:
            gui.init()
        except OSError as exc:
            print(f"[warn] GUI server unavailable on {args.ip}:{args.port}: "
                  f"{exc}")
            gui = None

    from gaussianavatars_tpu.train.loop import training
    from gaussianavatars_tpu.utils.system import profile_trace

    with profile_trace(args.profile_dir):
        training(
            model_cfg, opt_cfg, pipe_cfg,
            testing_iterations=set(args.test_iterations),
            saving_iterations=set(args.save_iterations),
            checkpoint_iterations=set(args.checkpoint_iterations),
            start_checkpoint=args.start_checkpoint,
            tb_writer=tb_writer,
            gui=gui,
            debug_from=args.debug_from,
        )
    if gui is not None:
        gui.close()
    print("\nTraining complete.")


if __name__ == "__main__":
    main()
