"""Aux subsystems: checkpoint round-trip, logging, configs, CLI plumbing."""

import json
import os
import subprocess
import sys

import numpy as np

from brdf_tpu.configs import PRESETS, FitConfig, SceneConfig
from brdf_tpu.utils.checkpoint import FitCheckpointer, load_fit_state, save_fit_state
from brdf_tpu.utils.logging import EventLog, log_event
from brdf_tpu.utils.profiling import rays_per_sec


def test_checkpoint_roundtrip(tmp_path):
    arrays = {"params": np.random.rand(100, 3, 3).astype(np.float32),
              "face_ids": np.arange(100)}
    save_fit_state(str(tmp_path), 7, arrays, metadata={"model": "blinn_phong"})
    loaded, meta = load_fit_state(str(tmp_path))
    np.testing.assert_array_equal(loaded["params"], arrays["params"])
    np.testing.assert_array_equal(loaded["face_ids"], arrays["face_ids"])
    assert meta["model"] == "blinn_phong"


def test_checkpointer_retention(tmp_path):
    ck = FitCheckpointer(str(tmp_path), every=1, keep=2)
    for step in range(5):
        ck.maybe_save(step, {"x": np.full(4, step)})
    steps = sorted(os.listdir(tmp_path))
    assert steps == ["step_00000003", "step_00000004"]
    arrays, _ = ck.restore()
    np.testing.assert_array_equal(arrays["x"], np.full(4, 4))


def test_event_log(tmp_path):
    path = str(tmp_path / "events.jsonl")
    log = EventLog(path)
    log("test_event", value=42)
    log.close()
    with open(path) as fh:
        events = [json.loads(l) for l in fh]
    assert events[0]["kind"] == "test_event" and events[0]["value"] == 42


def test_config_json_roundtrip():
    cfg = PRESETS["bunny-ct"]
    text = cfg.to_json()
    back = FitConfig.from_json(text)
    assert back.model.model == "cook_torrance"
    assert back.scene.scene_dir == cfg.scene.scene_dir
    assert back.solver.robust == "huber"


def test_rays_per_sec():
    assert rays_per_sec(1000, 16, 2.0, passes=2) == 16000.0


def test_cli_presets_and_info():
    env = dict(os.environ, JAX_PLATFORMS="")
    out = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms','cpu');"
         "from brdf_tpu.cli import main; main(['presets'])"],
        capture_output=True, text=True, cwd="/root/repo", timeout=120,
    )
    assert out.returncode == 0, out.stderr
    assert "bunny-ct" in out.stdout
    assert "cup-single" in out.stdout


def test_cli_fit_and_render_smoke(tmp_path):
    """End-to-end CLI on the cup dataset with 2 views (small but real)."""
    script = f"""
import jax
jax.config.update('jax_platforms','cpu')
import json
from brdf_tpu.cli import main
from brdf_tpu.configs import FitConfig, SceneConfig, ModelConfig, SolverConfig
cfg = FitConfig(
    scene=SceneConfig(scene_dir='/root/reference/img/cup', views=[0, 8]),
    model=ModelConfig(model='blinn_phong'),
    solver=SolverConfig(itmax=8, engine='xla'),
    name='smoke',
)
open('{tmp_path}/cfg.json','w').write(cfg.to_json())
rc = main(['fit', '--config', '{tmp_path}/cfg.json', '--out', '{tmp_path}/run'])
assert rc == 0
rc = main(['render', '--run', '{tmp_path}/run', '--view', '0'])
assert rc == 0
rc = main(['relight', '--run', '{tmp_path}/run', '--view', '0',
           '--env', 'constant:1.0', '--env-samples', '128',
           '--out', '{tmp_path}/run/env.png'])
assert rc == 0
rc = main(['export', '--run', '{tmp_path}/run', '--stats'])
assert rc == 0
s = json.load(open('{tmp_path}/run/maps/summary.json'))
assert s['model'] == 'blinn_phong' and 'kd' in s and 'n' in s
m = json.load(open('{tmp_path}/run/maps/metrics.json'))
assert len(m['reprojection_mae']) == 3 and 'fraction_at_bounds' in m
assert isinstance(m['warnings'], list)
assert 'device_ready' in [__import__('json').loads(l)['kind']
                          for l in open('{tmp_path}/run/events.jsonl')]
"""
    out = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True, text=True, cwd="/root/repo", timeout=600,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    assert os.path.exists(tmp_path / "run" / "render_view0.png")
    _assert_smoke_artifacts(tmp_path)


def _assert_smoke_artifacts(tmp_path):
    assert os.path.exists(tmp_path / "run" / "env.png")
    assert os.path.exists(tmp_path / "run" / "maps" / "param_kd.png")
    events = [json.loads(l) for l in open(tmp_path / "run" / "events.jsonl")]
    kinds = [e["kind"] for e in events]
    assert "fit_done" in kinds and "saved" in kinds


def test_cli_export_coverage_and_render_watch(tmp_path):
    """`export --coverage` writes the pixel↔surface-map overlay (the
    DrawMapping replacement, glutcallbacks.cpp:645-661) and `render --watch`
    re-renders when the run's fit state advances."""
    script = f"""
import jax
jax.config.update('jax_platforms','cpu')
import os, threading, time
from brdf_tpu.cli import main
from brdf_tpu.configs import FitConfig, SceneConfig, ModelConfig, SolverConfig
cfg = FitConfig(
    scene=SceneConfig(scene_dir='/root/reference/img/cup', views=[0]),
    model=ModelConfig(model='blinn_phong'),
    solver=SolverConfig(itmax=4, engine='xla'),
    name='watch',
)
open('{tmp_path}/cfg.json','w').write(cfg.to_json())
run = '{tmp_path}/run'
assert main(['fit', '--config', '{tmp_path}/cfg.json', '--out', run]) == 0
assert main(['export', '--run', run, '--coverage']) == 0
cov = os.path.join(run, 'maps', 'coverage_view0.png')
assert os.path.exists(cov), cov
# signed photo-minus-render residual diagnostic (round 5)
assert main(['export', '--run', run, '--residual']) == 0
res = os.path.join(run, 'maps', 'residual_view0.png')
assert os.path.exists(res), res
import json as _json
s = _json.load(open(os.path.join(run, 'maps', 'summary.json')))
assert 'residual' in s and 'positive_fraction' in s['residual']

png = os.path.join(run, 'render_view0.png')
t = threading.Thread(target=main, args=(
    ['render', '--run', run, '--watch', '--watch-interval', '0.3',
     '--watch-count', '20'],))
t.start()
for _ in range(100):
    if os.path.exists(png):
        break
    time.sleep(0.1)
m0 = os.path.getmtime(png)
time.sleep(0.5)
from brdf_tpu.utils.checkpoint import load_fit_state, save_fit_state
arrays, meta = load_fit_state(run)
save_fit_state(run, 1, arrays, metadata=meta)   # fit state advances
t.join(timeout=60)
assert not t.is_alive()
assert os.path.getmtime(png) > m0, 'watch loop must have re-rendered'
"""
    out = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True, text=True, cwd="/root/repo", timeout=600,
    )
    assert out.returncode == 0, out.stderr[-3000:]


def test_cli_joint_view_gains_end_to_end(tmp_path):
    """`fit` with SolverConfig.fit_view_gains: gains are fitted, stored
    with the run, surfaced in the metrics, applied to scan-view renders
    (and only there — custom-light renders are material-space)."""
    script = f"""
import jax
jax.config.update('jax_platforms','cpu')
import json
import numpy as np
from PIL import Image
from brdf_tpu.cli import main
from brdf_tpu.configs import FitConfig, SceneConfig, ModelConfig, SolverConfig
cfg = FitConfig(
    scene=SceneConfig(scene_dir='/root/reference/img/cup', views=[0, 8, 12]),
    model=ModelConfig(model='cook_torrance', joint_normalmap=True),
    solver=SolverConfig(itmax=4, engine='xla', fit_view_gains=True,
                        view_gain_rounds=1),
    name='gains-e2e',
)
open('{tmp_path}/cfg.json','w').write(cfg.to_json())
run = '{tmp_path}/run'
assert main(['fit', '--config', '{tmp_path}/cfg.json', '--out', run]) == 0
assert main(['export', '--run', run, '--stats', '--residual']) == 0
m = json.load(open(run + '/maps/metrics.json'))
assert 'view_gains' in m and len(m['view_gains']) == 3
assert all(0.5 <= g <= 2.0 for g in m['view_gains'])
# scan-view render applies the gain; custom-light render does not
assert main(['render', '--run', run, '--view', '0',
             '--out', run + '/scan.png']) == 0
assert main(['render', '--run', run, '--view', '0',
             '--light', '300,150,300', '--out', run + '/custom.png']) == 0
assert np.asarray(Image.open(run + '/scan.png')).sum() > 0
print('PASS')
"""
    out = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True, text=True, cwd="/root/repo", timeout=900,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    assert "PASS" in out.stdout


def test_cli_single_material_export_stats(tmp_path):
    """`export --stats` on a SINGLE-MATERIAL run: params expand to every mesh
    face but the rebuilt quality problem keeps only visible faces — the audit
    must align them instead of crashing on a broadcast mismatch
    (round-3 ADVICE; the cup mesh has invisible faces in any 2-view subset)."""
    script = f"""
import jax
jax.config.update('jax_platforms','cpu')
import json
from brdf_tpu.cli import main
from brdf_tpu.configs import FitConfig, SceneConfig, ModelConfig, SolverConfig
cfg = FitConfig(
    scene=SceneConfig(scene_dir='/root/reference/img/cup', views=[0, 8]),
    model=ModelConfig(model='blinn_phong', per_texel=False),
    solver=SolverConfig(itmax=20, engine='xla'),
    name='smoke_single',
)
open('{tmp_path}/cfg.json','w').write(cfg.to_json())
rc = main(['fit', '--config', '{tmp_path}/cfg.json', '--out', '{tmp_path}/run'])
assert rc == 0
rc = main(['export', '--run', '{tmp_path}/run', '--stats'])
assert rc == 0
m = json.load(open('{tmp_path}/run/maps/metrics.json'))
assert len(m['reprojection_mae']) == 3
"""
    out = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True, text=True, cwd="/root/repo", timeout=600,
    )
    assert out.returncode == 0, out.stderr[-3000:]
