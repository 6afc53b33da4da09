#!/usr/bin/env python
"""Generate scenes with fully-random events (reference scripts/generate/
generate_with_random_events.py surface): every unset parameter samples from the
Scene's default distributions."""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from audiblelight_tpu import config, utils
from audiblelight_tpu.core import Scene
from audiblelight_tpu.utils import logger


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--fg-dir", type=str, required=True)
    parser.add_argument("--output-dir", type=str, required=True)
    parser.add_argument("--n-scenes", type=int, default=1)
    parser.add_argument("--duration", type=float, default=config.SCENE_DURATION)
    parser.add_argument("--backend", choices=["shoebox", "rlr", "sofa"], default="shoebox")
    parser.add_argument("--mesh", type=str, default=None)
    parser.add_argument("--sofa", type=str, default=None)
    parser.add_argument("--mic", type=str, default=config.MIC_ARRAY_TYPE)
    parser.add_argument("--n-static", type=int, default=config.DEFAULT_STATIC_EVENTS)
    parser.add_argument("--n-moving", type=int, default=config.DEFAULT_MOVING_EVENTS)
    parser.add_argument("--seed", type=int, default=utils.SEED)
    args = parser.parse_args()

    rng = np.random.default_rng(args.seed)
    out_root = Path(args.output_dir)
    out_root.mkdir(parents=True, exist_ok=True)

    for idx in range(args.n_scenes):
        if args.backend == "shoebox":
            backend_kwargs = dict(
                dimensions=rng.uniform([5, 4, 2.6], [10, 8, 3.5]).tolist(),
                seed=int(rng.integers(2**31)),
            )
        elif args.backend == "rlr":
            backend_kwargs = dict(mesh=args.mesh, add_to_context=False)
        else:
            backend_kwargs = dict(sofa=args.sofa)

        scene = Scene(
            duration=args.duration,
            backend=args.backend,
            backend_kwargs=backend_kwargs,
            fg_path=args.fg_dir,
        )
        scene.add_microphone(microphone_type=args.mic)
        for _ in range(args.n_static):
            try:
                scene.add_event(event_type="static", max_place_attempts=100)
            except (ValueError, FileNotFoundError) as e:
                logger.warning(f"Static placement failed: {e}")
        for _ in range(args.n_moving):
            try:
                scene.add_event(event_type="moving", max_place_attempts=100)
            except (ValueError, FileNotFoundError) as e:
                logger.warning(f"Moving placement failed: {e}")
        scene.add_ambience(noise="gaussian")

        out_dir = out_root / f"scene_{idx:04d}"
        out_dir.mkdir(exist_ok=True)
        scene.generate(output_dir=out_dir)
        logger.warning(f"[{idx + 1}/{args.n_scenes}] wrote {out_dir}")


if __name__ == "__main__":
    main()
