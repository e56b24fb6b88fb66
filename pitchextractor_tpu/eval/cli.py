"""Robustness-evaluation CLI — the scripted replacement for the reference's
six ``Utils/*.ipynb`` notebooks (see eval/suites.py for the suite map).

Installed as ``pitchextractor-eval``; also reachable as
``python evaluate.py`` from a checkout (same contract).
"""

from __future__ import annotations

import json
import os

import click


@click.command()
@click.option("--checkpoint", default=None, type=str)
@click.option("--checkpoint_dir", default="Checkpoint", type=str)
@click.option("--config_path", default="./Configs/config.yml", type=str)
@click.option("--suites", default="all", type=str, help="comma-separated suite names or 'all'")
@click.option("--output_dir", default="notebooks/artifacts", type=str)
@click.option("--eval_list", default=None, type=str, help="path|label list of real audio for the real_audio suite")
@click.option(
    "--compare",
    default=None,
    nargs=2,
    type=str,
    help="diff two runs' suite CSV dirs (A B; deltas are B - A) instead of running inference",
)
def main(checkpoint, checkpoint_dir, config_path, suites, output_dir, eval_list, compare):
    if compare:
        from pitchextractor_tpu.eval.compare import compare_dirs, summarize

        results = compare_dirs(compare[0], compare[1], output_dir=output_dir)
        if not results:
            raise SystemExit(f"No common *_metrics.csv between {compare[0]} and {compare[1]}")
        print(json.dumps(summarize(results), indent=2, sort_keys=True))
        return

    from pitchextractor_tpu import config as config_lib
    from pitchextractor_tpu.eval.suites import SUITES, run_all
    from pitchextractor_tpu.infer import F0Predictor, latest_checkpoint, load_model
    from pitchextractor_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()

    config = {}
    if os.path.isfile(config_path):
        config = config_lib.resolve(config_lib.load_config(config_path))

    if checkpoint is None:
        checkpoint = latest_checkpoint(checkpoint_dir)
        if checkpoint is None:
            raise SystemExit(f"No checkpoint found under {checkpoint_dir}")
    model, variables = load_model(checkpoint, config)
    mel_params = (config.get("dataset_params", {}) or {}).get("mel_params")
    predictor = F0Predictor(model, variables, mel_params=mel_params)

    selected = None if suites == "all" else [s.strip() for s in suites.split(",") if s.strip()]
    if selected:
        unknown = set(selected) - set(SUITES)
        if unknown:
            raise SystemExit(f"Unknown suites: {sorted(unknown)}; available: {sorted(SUITES)}")
    suite_config = {}
    if eval_list:
        suite_config["real_audio"] = {
            "eval_list": eval_list,
            "f0_params": (config.get("dataset_params", {}) or {}).get("f0_params"),
        }
    results = run_all(predictor, output_dir, suites=selected, config=suite_config)
    print(json.dumps(summarize_results(results), indent=2, sort_keys=True))


def summarize_results(results: dict) -> dict:
    """Per-suite summary that never hides coverage gaps: skipped rows are
    counted explicitly (round-2 weakness: means silently absorbed them) and
    when rows carry a family tag (the codec suite's bandwidth / codec /
    codec_proxy split) each family gets its own mean so proxy rows are never
    quoted as real-codec numbers."""
    summary = {}
    for name, rows in results.items():
        scored = [r for r in rows if isinstance(r.get("RPA"), float)]
        skipped = [r for r in rows if r.get("skipped")]
        entry = {
            "rows": len(scored),
            "skipped": len(skipped),
            "mean_RPA": float(
                sum(r["RPA"] for r in scored) / max(len(scored), 1)
            ),
        }
        if skipped:
            entry["skipped_conditions"] = sorted(
                str(r.get("condition", "?")) for r in skipped
            )
        families = sorted({str(r.get("suite")) for r in scored if r.get("suite")})
        if len(families) > 1:
            entry["families"] = {
                fam: {
                    "rows": sum(1 for r in scored if str(r.get("suite")) == fam),
                    "mean_RPA": float(
                        sum(r["RPA"] for r in scored if str(r.get("suite")) == fam)
                        / max(sum(1 for r in scored if str(r.get("suite")) == fam), 1)
                    ),
                }
                for fam in families
            }
        summary[name] = entry
    return summary


if __name__ == "__main__":
    main()
