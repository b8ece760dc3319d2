"""Log/TB scalar extraction + smoothing (reference: basicsr/utils/plot_util.py)."""

from __future__ import annotations

import re


def read_data_from_tensorboard(log_path: str, tag: str):
    """(steps, values) for a scalar tag from TB events (plot_util.py:4-21)."""
    from tensorboard.backend.event_processing.event_accumulator import EventAccumulator

    event_acc = EventAccumulator(log_path)
    event_acc.Reload()
    scalar_list = event_acc.Tags()["scalars"]
    print("tag list: ", scalar_list)
    steps = [int(s.step) for s in event_acc.Scalars(tag)]
    values = [s.value for s in event_acc.Scalars(tag)]
    return steps, values


def read_data_from_txt_2v(path: str, pattern: str, step_one: bool = False):
    """Regex-extract (step, value) pairs from a log txt (plot_util.py:24-46)."""
    with open(path) as f:
        lines = [line.strip() for line in f.readlines()]
    steps, values = [], []
    compiled = re.compile(pattern)
    for line in lines:
        match = compiled.match(line)
        if match:
            steps.append(int(match.group(1)))
            values.append(float(match.group(2)))
    if step_one:
        steps = [v + 1 for v in steps]
    return steps, values


def read_data_from_txt_1v(path: str, pattern: str):
    """Regex-extract single values from a log txt (plot_util.py:49-64)."""
    with open(path) as f:
        lines = [line.strip() for line in f.readlines()]
    data = []
    compiled = re.compile(pattern)
    for line in lines:
        match = compiled.match(line)
        if match:
            data.append(float(match.group(1)))
    return data


def smooth_data(values, smooth_weight: float):
    """TensorBoard's 1st-order IIR smoothing (plot_util.py:67-83)."""
    values_sm = []
    last_sm_value = values[0]
    for value in values:
        value_sm = last_sm_value * smooth_weight + (1 - smooth_weight) * value
        values_sm.append(value_sm)
        last_sm_value = value_sm
    return values_sm
