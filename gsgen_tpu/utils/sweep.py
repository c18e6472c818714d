"""Hyper-parameter sweep expansion + sequential runner.

Port of utils/sweep.py:57-117 + sweep.py in gsgen3d/gsgen: a sweep YAML
maps dotted config fields to value lists; ``joint_fields`` are zipped
together, everything else is crossed.  The reference schedules one
process per free GPU (sweep.py:80-122, nvitop polling); here the single
TPU chip runs configs sequentially (``run_sweep``) — multi-host fleets
schedule the emitted config files themselves.

Sweep YAML example:
    joint_fields: [trainer.max_steps, trainer.batch_size]
    trainer.max_steps: [100, 200]
    trainer.batch_size: [2, 4]
    init.num_points: [256, 1024]      # crossed -> 2 * 2 = 4 configs
"""

from __future__ import annotations

import copy
import itertools
from pathlib import Path
from typing import Dict, List, Optional

import yaml

from ..config import load_config, set_dotted


def generate_sweep_configs(base_config: str, sweep_spec: Dict,
                           out_dir: str = "sweep", base: int = 0
                           ) -> List[str]:
    """Expand a sweep spec over a base config into numbered YAML files."""
    cfg0 = load_config(base_config)
    spec = dict(sweep_spec)
    joint_fields = spec.pop("joint_fields", []) or []
    joint_lens = {len(spec[f]) for f in joint_fields}
    assert len(joint_lens) <= 1, "joint fields must have equal length"
    joint_len = joint_lens.pop() if joint_lens else 0
    cross_fields = [f for f in spec if f not in joint_fields]

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    paths = []
    cnt = 0
    for cross_items in itertools.product(*[spec[f] for f in cross_fields]):
        base_cfg = copy.deepcopy(cfg0)
        for f, v in zip(cross_fields, cross_items):
            set_dotted(base_cfg, f, v)
        joint_iter = (zip(*[spec[f] for f in joint_fields])
                      if joint_len else [()])
        for joint_items in joint_iter:
            cfg = copy.deepcopy(base_cfg)
            for f, v in zip(joint_fields, joint_items):
                set_dotted(cfg, f, v)
            p = out / f"{cnt + base}.yaml"
            p.write_text(yaml.safe_dump(cfg))
            paths.append(str(p))
            cnt += 1
    return paths


def run_sweep(config_paths: List[str], steps: Optional[int] = None,
              log_root: str = "checkpoints/sweep"):
    """Run sweep configs sequentially on the local device."""
    from ..config import build_trainer
    from ..io.logging import RunLogger
    results = []
    for p in config_paths:
        cfg = load_config(p)
        name = Path(p).stem
        logger = RunLogger(root=log_root, name=name)
        logger.save_config(cfg)
        trainer = build_trainer(cfg, logger=logger)
        trainer.fit(steps)
        results.append({"config": p, "run_dir": str(logger.dir)})
        logger.close()
    return results
