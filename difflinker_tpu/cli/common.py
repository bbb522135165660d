"""Shared CLI plumbing: stdout tee logger, config/arg merging, run dirs."""
from __future__ import annotations

import argparse
import os
import sys
from datetime import datetime


class Logger:
    """Tee stdout to a log file (reference src/utils.py:8-23)."""

    def __init__(self, logpath: str, stream=None):
        self.terminal = stream or sys.stdout
        os.makedirs(os.path.dirname(logpath), exist_ok=True)
        self.log = open(logpath, 'a')

    def write(self, message):
        self.terminal.write(message)
        self.log.write(message)
        self.log.flush()

    def flush(self):
        self.terminal.flush()


def log(*args):
    print(f'[{datetime.now()}]', *args)


def setup_run_dirs(base_logs: str, base_ckpts: str, exp_name: str):
    start_time = datetime.now().strftime('date%d-%m_time%H-%M-%S.%f')
    run_id = f'{exp_name}_{start_time}'
    log_dir = os.path.join(base_logs, run_id)
    ckpt_dir = os.path.join(base_ckpts, run_id)
    os.makedirs(log_dir, exist_ok=True)
    os.makedirs(ckpt_dir, exist_ok=True)
    return run_id, log_dir, ckpt_dir


def add_config_arg(parser: argparse.ArgumentParser):
    parser.add_argument('--config', type=str, default=None,
                        help='YAML config (ours or reference-format)')
    return parser
