"""Multi-process/DCN story (VERDICT r2 next #6): two CPU processes over a
global hybrid mesh must reproduce the single-process counters exactly.

Each worker initializes jax.distributed via the env contract
(parallel/distributed.py), builds the DCN-aware ('data','model') mesh,
contributes its process-local slice of a deterministic global batch, and
runs one jitted program (FGSM attack + success counters) whose reductions
cross the process boundary.
"""

import json
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

_WORKER = r"""
import json, os, sys
import jax
jax.config.update("jax_platforms", "cpu")

from image_recognition_adversarial_example_attack_tpu.parallel.distributed import (
    make_dcn_mesh, maybe_initialize_distributed, process_local_batch,
)

assert maybe_initialize_distributed(), "env contract did not trigger init"
import jax.numpy as jnp
import numpy as np

from image_recognition_adversarial_example_attack_tpu.attacks import (
    fgsm_attack, make_logits_fn,
)
from image_recognition_adversarial_example_attack_tpu.core.constants import (
    IMAGENET_MEAN, IMAGENET_STD,
)
from image_recognition_adversarial_example_attack_tpu.models.tiny import make_tiny

mesh = make_dcn_mesh(n_model=1)
model, variables = make_tiny(seed=0, image_size=16, num_classes=8)
lf = make_logits_fn(model, variables, IMAGENET_MEAN, IMAGENET_STD)

x_global = np.asarray(
    np.random.RandomState(0).uniform(0.2, 0.8, (8, 16, 16, 3)), np.float32)
x = process_local_batch(x_global, mesh)

def program(x):
    y = jnp.argmax(lf(x), -1)
    x_adv = fgsm_attack(lf, x, y, eps=8/255)
    succ = (jnp.argmax(lf(x_adv), -1) != y).astype(jnp.int32)
    return {"attack_success": jnp.sum(succ),
            "pred_sum": jnp.sum(y.astype(jnp.int64))}

out = jax.jit(program, out_shardings=None)(x)
out = {k: int(v) for k, v in jax.device_get(out).items()}
if jax.process_index() == 0:
    print("RESULT " + json.dumps({
        "counters": out,
        "n_processes": jax.process_count(),
        "n_devices": len(jax.devices()),
        "mesh": dict(mesh.shape),
    }), flush=True)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_counters_match_single_process():
    port = _free_port()
    repo = Path(__file__).resolve().parent.parent
    procs = []
    for pid in range(2):
        env = {
            "PATH": "/usr/bin:/bin",
            "HOME": "/root",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
            "ADV_TPU_COORDINATOR": f"127.0.0.1:{port}",
            "ADV_TPU_NUM_PROCESSES": "2",
            "ADV_TPU_PROCESS_ID": str(pid),
        }
        procs.append(subprocess.Popen(
            [sys.executable, "-c", _WORKER], env=env, cwd=str(repo),
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        outs.append(out)

    lines = [ln for ln in outs[0].splitlines() if ln.startswith("RESULT ")]
    assert lines, f"no RESULT line from process 0:\n{outs[0]}"
    got = json.loads(lines[0][len("RESULT "):])
    assert got["n_processes"] == 2
    assert got["n_devices"] == 8  # 2 procs x 4 virtual devices
    assert got["mesh"] == {"data": 8, "model": 1}

    # single-process expectation: the same program over the same global
    # batch, computed in-process (8 virtual devices via conftest)
    import jax
    import jax.numpy as jnp

    from image_recognition_adversarial_example_attack_tpu.attacks import (
        fgsm_attack,
        make_logits_fn,
    )
    from image_recognition_adversarial_example_attack_tpu.core.constants import (
        IMAGENET_MEAN,
        IMAGENET_STD,
    )
    from image_recognition_adversarial_example_attack_tpu.models.tiny import (
        make_tiny,
    )

    model, variables = make_tiny(seed=0, image_size=16, num_classes=8)
    lf = make_logits_fn(model, variables, IMAGENET_MEAN, IMAGENET_STD)
    x = jnp.asarray(np.random.RandomState(0).uniform(
        0.2, 0.8, (8, 16, 16, 3)), jnp.float32)
    y = jnp.argmax(lf(x), -1)
    x_adv = fgsm_attack(lf, x, y, eps=8 / 255)
    want = {
        "attack_success": int(jnp.sum(
            (jnp.argmax(lf(x_adv), -1) != y).astype(jnp.int32))),
        "pred_sum": int(jnp.sum(y.astype(jnp.int64))),
    }
    assert got["counters"] == want


def test_make_dcn_mesh_single_process_fallback():
    from image_recognition_adversarial_example_attack_tpu.parallel.distributed import (
        make_dcn_mesh,
    )

    mesh = make_dcn_mesh(n_model=2)
    assert dict(mesh.shape) == {"data": 4, "model": 2}


def test_process_local_batch_single_process():
    import jax

    from image_recognition_adversarial_example_attack_tpu.parallel.distributed import (
        make_dcn_mesh,
        process_local_batch,
    )

    mesh = make_dcn_mesh()
    x = np.arange(8 * 2, dtype=np.float32).reshape(8, 2)
    arr = process_local_batch(x, mesh)
    np.testing.assert_array_equal(np.asarray(arr), x)
    assert arr.sharding.spec == jax.sharding.PartitionSpec("data")
