"""Config factory — argparse + registry-default YAML + override merging.

Rebuild of utils/configuration.py:14-92. Builds the experiment config as a
``ConfigDict`` (munch parity) from:

1. a base dict {tag, seed, use_gpu, output_dir, restore} (:24-33);
2. registry default YAMLs for --algo/--task/--safety_filter, placed under
   algo_config/task_config/sf_config (:64-69);
3. deep-merged --overrides YAML files (:76-77);
4. --kv_overrides key=value pairs deep-set with literal eval (:78-87);
5. --restore reload of a saved config.yaml (:61-63).
"""

from __future__ import annotations

import argparse
import ast
import os
from typing import Dict, Optional

from safe_control_gym_tpu.utils.registration import get_config
from safe_control_gym_tpu.utils.utils import (ConfigDict, deep_set,
                                              merge_dict, munchify, read_file)

__all__ = ['ConfigFactory']


class ConfigFactory:
    """Manager class that's in charge of experiment configs."""

    def __init__(self):
        self.parser = argparse.ArgumentParser(description='Benchmark')
        self.add_arguments()
        self.base_dict = dict(
            tag='temp',
            seed=None,
            use_gpu=False,
            output_dir='./results',
            restore=None,
        )

    def add_argument(self, *args, **kwargs):
        self.parser.add_argument(*args, **kwargs)

    def add_arguments(self):
        """Registers base arguments (configuration.py:34-51)."""
        self.add_argument('--tag', type=str, help='id of the experiment')
        self.add_argument('--seed', type=int, help='random seed')
        self.add_argument('--use_gpu', action='store_true', help='added for parity; TPU/backend choice is automatic')
        self.add_argument('--output_dir', type=str, help='output saving folder')
        self.add_argument('--restore', type=str, help='folder to reload from')
        self.add_argument('--algo', type=str, help='algorithm id')
        self.add_argument('--task', type=str, help='task/environment id')
        self.add_argument('--safety_filter', type=str, help='safety filter id')
        self.add_argument('--overrides', nargs='+', type=str, help='override config files')
        self.add_argument('--kv_overrides', nargs='+', type=str, help='override key-value pairs')

    def merge(self, config_override: Optional[Dict] = None) -> ConfigDict:
        """Creates experiment config object from command line and config files."""
        config_dict = dict(self.base_dict)
        args, _ = self.parser.parse_known_args()
        if config_override:
            config_dict.update(config_override)
        # Restore a saved config first (configuration.py:61-63).
        if args.restore:
            restore_path = os.path.join(args.restore, 'config.yaml')
            config_dict.update(read_file(restore_path) or {})
        # Registry defaults (configuration.py:64-69).
        if args.algo:
            config_dict['algo'] = args.algo
            config_dict['algo_config'] = get_config(args.algo)
        if args.task:
            config_dict['task'] = args.task
            config_dict['task_config'] = get_config(args.task)
        if args.safety_filter:
            config_dict['safety_filter'] = args.safety_filter
            config_dict['sf_config'] = get_config(args.safety_filter)
        # Overrides files (configuration.py:76-77).
        if args.overrides:
            for f in args.overrides:
                merge_dict(config_dict, read_file(f) or {})
        # Command-line key-value overrides (configuration.py:78-87).
        if args.kv_overrides:
            for kv in args.kv_overrides:
                k, v = kv.split('=', 1)
                try:
                    value = ast.literal_eval(v.strip())
                except (ValueError, SyntaxError):
                    value = v.strip()
                deep_set(config_dict, k.strip(), value)
        # CLI base args override files.
        for k in ('tag', 'seed', 'output_dir', 'restore'):
            v = getattr(args, k, None)
            if v is not None:
                config_dict[k] = v
        if getattr(args, 'use_gpu', False):
            config_dict['use_gpu'] = True
        if config_dict.get('seed') is None:
            config_dict['seed'] = 0
        return munchify(config_dict)
