"""Environment layer: batched functional humanoid tasks.

Task registry mirrors the reference's name-based dispatch
(``ase/utils/parse_task.py:22-45``) so the same ``--task`` CLI values work.
"""

from ase_tpu.envs.humanoid import EnvState, Humanoid
from ase_tpu.envs.humanoid_amp import HumanoidAMP
from ase_tpu.envs.humanoid_amp_getup import HumanoidAMPGetup
from ase_tpu.envs.humanoid_amp_task import HumanoidAMPTask
from ase_tpu.envs.humanoid_heading import HumanoidHeading
from ase_tpu.envs.humanoid_location import HumanoidLocation
from ase_tpu.envs.humanoid_perturb import HumanoidPerturb
from ase_tpu.envs.humanoid_reach import HumanoidReach
from ase_tpu.envs.humanoid_strike import HumanoidStrike
from ase_tpu.envs.humanoid_view_motion import HumanoidViewMotion

TASK_REGISTRY = {
    "Humanoid": Humanoid,
    "HumanoidAMP": HumanoidAMP,
    "HumanoidAMPGetup": HumanoidAMPGetup,
    "HumanoidHeading": HumanoidHeading,
    "HumanoidLocation": HumanoidLocation,
    "HumanoidReach": HumanoidReach,
    "HumanoidStrike": HumanoidStrike,
    "HumanoidPerturb": HumanoidPerturb,
    "HumanoidViewMotion": HumanoidViewMotion,
}


def parse_task(task_name: str, cfg, headless: bool = True):
    """Instantiate a task by name (reference parse_task.py semantics)."""
    try:
        cls = TASK_REGISTRY[task_name]
    except KeyError:
        raise ValueError(
            f"unknown task {task_name!r}; available: {sorted(TASK_REGISTRY)}"
        )
    return cls(cfg, headless=headless)
