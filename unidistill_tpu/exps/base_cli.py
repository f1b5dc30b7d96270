"""Experiment CLI — same ergonomics as the reference's `run_cli`
(ref exps/base_cli.py:12-59; DictAction utils/__init__.py:4-93):

  python …_exp.py                 # train
  python …_exp.py -e --ckpt_path X  # evaluate on val
  python …_exp.py -p --ckpt_path X  # predict on test (submission dump)
  flags: -b/--batch_size_per_device, --max_epochs, --seed,
         --exp_options k.l=v (nested config overrides), --data_root.
"""
from __future__ import annotations

import argparse
import ast
import dataclasses
import os
from typing import Dict, Optional

import numpy as np

from unidistill_tpu.configs import nuscenes as cfgs
from unidistill_tpu.data.collate import DataLoader
from unidistill_tpu.data.dataset import NuScenesDataset
from unidistill_tpu.training import checkpoint as ckpt_lib
from unidistill_tpu.training.loop import Trainer
from unidistill_tpu.training.train_state import TrainState, create_train_state


def parse_exp_options(pairs) -> Dict[str, object]:
    """`k=v` strings → python values (the reference's DictAction semantics)."""
    out = {}
    for pair in pairs or []:
        k, _, v = pair.partition("=")
        try:
            out[k] = ast.literal_eval(v)
        except (ValueError, SyntaxError):
            out[k] = v
    return out


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(add_help=True)
    p.add_argument("-e", "--evaluate", action="store_true",
                   help="evaluate model on validation set")
    p.add_argument("-p", "--predict", action="store_true",
                   help="predict model on testing set")
    p.add_argument("-b", "--batch_size_per_device", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--ckpt_path", type=str, default=None)
    p.add_argument("--max_epochs", type=int, default=None)
    p.add_argument("--data_root", type=str, default=None)
    p.add_argument("--num_workers", type=int, default=10)
    p.add_argument("--exp_options", nargs="+", default=None,
                   help="nested config overrides, e.g. model.det_head.iou_weight=2.0")
    return p


def run_cli(exp_cfg: cfgs.ExpConfig, exp_name: Optional[str] = None):
    args = build_parser().parse_args()
    if exp_name:
        exp_cfg = dataclasses.replace(exp_cfg, exp_name=exp_name)
    overrides = parse_exp_options(args.exp_options)
    if args.batch_size_per_device:
        overrides["train.batch_size_per_device"] = args.batch_size_per_device
    if args.max_epochs:
        overrides["train.max_epochs"] = args.max_epochs
    if args.data_root:
        overrides["data.root_path"] = args.data_root
    overrides["train.seed"] = args.seed
    exp_cfg = cfgs.apply_overrides(exp_cfg, overrides)
    np.random.seed(args.seed)

    trainer = Trainer(exp_cfg)
    global_batch = exp_cfg.train.batch_size_per_device * trainer.n_dev

    def loader(split, shuffle):
        ds = NuScenesDataset(exp_cfg.data, exp_cfg.model, split, seed=args.seed)
        return ds, DataLoader(
            ds, global_batch, shuffle=shuffle, drop_last=shuffle,
            num_workers=args.num_workers, seed=args.seed,
        )

    if args.evaluate or args.predict:
        split = "validation" if args.evaluate else "testing"
        ds, dl = loader(split, shuffle=False)
        sample = next(iter(dl))
        state = trainer.init_state(sample, steps_per_epoch=1)
        if args.ckpt_path:
            restored = ckpt_lib.restore_checkpoint_any(args.ckpt_path)
            state = TrainState(restored["step"], restored["params"],
                               restored["batch_stats"], state.opt_state)
        if args.evaluate:
            res = trainer.evaluate(state, dl, ds)
            print(res)
        else:
            preds = trainer.predict(state, dl)
            from unidistill_tpu.data.evaluate import generate_submission
            sub_dir = os.path.join(trainer.output_dir, "nuscenes_submission")
            generate_submission(preds, ds.infos[: len(preds)], sub_dir)
            # raw prediction dump alongside the json (ref
            # nuscenes_multimodal.py:395-415 dump_inference_results)
            import pickle
            with open(os.path.join(sub_dir, "boxes.pkl"), "wb") as f:
                pickle.dump(preds, f)
        return trainer

    ds, dl = loader("training", shuffle=True)
    try:
        val_ds, val_dl = loader("validation", shuffle=False)
    except (FileNotFoundError, OSError) as e:
        # hosts without a validation info pkl still train; per-epoch
        # validation is simply skipped (advisor r2)
        print(f"[base_cli] no validation split ({e}); per-epoch eval disabled")
        val_ds = val_dl = None
    state = trainer.fit(
        dl, exp_cfg.train.max_epochs, resume_from=args.ckpt_path,
        val_loader=val_dl, val_dataset=val_ds,
        eval_interval=exp_cfg.train.eval_interval,
    )
    ckpt_lib.save_checkpoint(os.path.join(trainer.output_dir, "ckpt"), state)
    return trainer
