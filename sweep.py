#!/usr/bin/env python
"""Local grid-sweep runner for the W&B-style sweep YAMLs.

The reference drives eval.yaml / mim.yaml / unet.yaml through the W&B sweep
service (SURVEY.md §4, "experiment sweeps as regression harness"); this
runner executes the same grid locally: the cartesian product of every
``values`` list becomes one subprocess invocation of ``program`` with
``--key value`` flags (single ``value`` entries are fixed flags).

Usage: python sweep.py eval.yaml [--dry_run] [-- extra args passed through]
"""

import argparse
import itertools
import subprocess
import sys

import yaml


def expand_grid(parameters):
    fixed, grids = {}, {}
    for key, spec in parameters.items():
        if "value" in spec:
            fixed[key] = spec["value"]
        elif "values" in spec:
            grids[key] = spec["values"]
    keys = sorted(grids)
    for combo in itertools.product(*(grids[k] for k in keys)):
        cfg = dict(fixed)
        cfg.update(dict(zip(keys, combo)))
        yield cfg


def build_cmd(program, cfg, extra=()):
    cmd = [sys.executable, program]
    for k, v in cfg.items():
        if v == "":
            continue
        if v is False:
            # the entry scripts keep the reference's argparse type=bool
            # flags, where bool('False') == True; only the empty string
            # parses falsy, so a false grid arm must be sent as ''
            cmd += [f"--{k}", ""]
            continue
        cmd += [f"--{k}", str(v)]
    return cmd + list(extra)


def main():
    parser = argparse.ArgumentParser("local sweep runner")
    parser.add_argument("sweep_yaml")
    parser.add_argument("--dry_run", action="store_true")
    args, rest = parser.parse_known_args()

    with open(args.sweep_yaml) as f:
        sweep = yaml.safe_load(f)
    program = sweep["program"]
    extra = [a for a in rest if a != "--"]

    runs = list(expand_grid(sweep.get("parameters", {})))
    print(f"{len(runs)} runs over {program} (metric: {sweep.get('metric', {}).get('name')})")
    failures = 0
    for i, cfg in enumerate(runs):
        cmd = build_cmd(program, cfg, extra)
        print(f"[{i + 1}/{len(runs)}] {' '.join(cmd)}")
        if args.dry_run:
            continue
        if subprocess.call(cmd) != 0:
            failures += 1
            print(f"run {i + 1} FAILED")
    if failures:
        sys.exit(1)


if __name__ == "__main__":
    main()
