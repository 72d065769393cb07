"""Smoke tests for the offline evaluation scripts (VERDICT r4 #2).

The LLC skill-space eval (scripts/eval_llc_skills.py) produced the shipped
docs/validation_llc_skills.json on the real chip; this test runs the same
main() end-to-end at toy sizes on the CPU backend so the harness itself is
exercised by the suite (build → checkpoint restore → pinned-latent rollout →
getup eval → JSON artifact).
"""

import json
import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(_ROOT, "scripts"))


def test_eval_llc_skills_smoke(tmp_path):
    import eval_llc_skills

    out = str(tmp_path / "skills.json")
    stats = eval_llc_skills.main([
        "--envs", "4", "--steps", "3",
        "--getup-envs", "4", "--getup-steps", "3",
        "--out", out,
    ])

    # headline keys the VALIDATION.md section cites
    for k in ("disc_reward", "enc_reward", "speed",
              "mean_pairwise_vel_dist", "stable_mean_pairwise_vel_dist",
              "n_unstable_latents_speed_gt_5", "fall_frac", "getup"):
        assert k in stats, k
    assert stats["n_latents"] == 4
    g = stats["getup"]
    assert g["recovery_steps"] == 3
    assert 0 <= g["n_fall_states"] <= 4

    # artifact round-trips and carries the raw per-latent arrays
    with open(out) as f:
        doc = json.load(f)
    assert len(doc["per_latent"]["disc_reward"]) == 4
    assert len(doc["per_latent"]["mean_vel"]) == 4
