"""Action-space diagnostic for a convergence-soak checkpoint.

Loads the latest checkpoint of a `tools/convergence_soak.py` run and
prints the confusion matrix between the model's inferred discrete actions
and the ground-truth MOTION labels of the synthetic square (derived from
the Video metadata states), plus Hungarian-matched accuracies vs both the
motion labels and the recorded GT actions.

This separates three failure modes the scalar accuracy cannot:
  - an unformed action space (uniform confusion rows);
  - a motion-pure but permuted partition (Hungarian fixes it — high
    accuracy);
  - a stratified partition (consistent within a nuisance stratum, e.g.
    per-video constant y in 3-action data, but sign-flipped across
    strata — rows mix 50/50 while the per-stratum mapping is crisp).

Usage:
    python tools/action_space_diag.py --root /tmp/soak_1d [--max-batches 30]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--root", required=True,
                        help="a convergence_soak --root directory")
    parser.add_argument("--max-batches", type=int, default=30)
    parser.add_argument("--platform", default=None)
    args = parser.parse_args()

    with open(os.path.join(args.root, "run_args.json")) as f:
        run_args = json.load(f)

    if args.platform:
        os.environ["PVG_PLATFORM"] = args.platform
    from playablevideogeneration_tpu.utils.jax_setup import setup_jax

    setup_jax()

    import numpy as np

    import tools.convergence_soak as cs
    from playablevideogeneration_tpu.cli.train import build_run
    from playablevideogeneration_tpu.config.configuration import Configuration
    from playablevideogeneration_tpu.data.video_dataset import collate
    from playablevideogeneration_tpu.evaluation.hungarian import (
        compute_actions_accuracy,
    )

    soak_args = argparse.Namespace(**run_args)
    config = Configuration(config=cs.build_config(soak_args))
    config.check_config()
    config = config.get_config()
    logger = cs.RecordingLogger(os.path.join(args.root, "diag_log.jsonl"))
    model, datasets, trainer, evaluators, _ = build_run(config, logger=logger)
    trainer.init_state(collate([datasets["train"][0]]))
    trainer.load_checkpoint()
    print(f"[diag] checkpoint at step {trainer.global_step}")

    variables = trainer.state.variables()
    actions, movements = cs.collect_action_movements(
        evaluators["validation"], variables, datasets,
        max_batches=args.max_batches)
    n_actions = soak_args.actions
    n_model = getattr(soak_args, "model_actions", None) or n_actions
    # Motion labels follow data/synthetic._ACTION_DELTAS order:
    # 0 stay, 1 left, 2 right, 3 up, 4 down.
    dx, dy = movements[:, 0], movements[:, 1]
    motion = np.zeros(len(movements), int)
    motion[dx < 0] = 1
    motion[dx > 0] = 2
    if n_actions > 3:
        motion[dy < 0] = 3
        motion[dy > 0] = 4

    conf = np.zeros((n_actions, n_model), int)
    for m, a in zip(motion, actions):
        conf[m, a] += 1
    print("[diag] confusion rows=motion(stay,left,right,up,down) "
          "cols=inferred action")
    print(conf)
    for k in range(n_model):
        sel = movements[actions == k]
        mean = sel.mean(0).round(3).tolist() if len(sel) else None
        print(f"[diag] inferred {k}: count={len(sel)} mean_movement={mean}")

    # Square matching over max(model, motion) labels: surplus model
    # clusters map to empty motion labels and count as errors.
    acc_motion, mapping = compute_actions_accuracy(
        actions, motion, max(n_actions, n_model))
    print(f"[diag] hungarian accuracy vs MOTION labels: {acc_motion:.4f} "
          f"(mapping {mapping})")
    print(json.dumps({"accuracy_vs_motion": round(float(acc_motion), 4),
                      "transitions": int(len(actions))}))


if __name__ == "__main__":
    main()
