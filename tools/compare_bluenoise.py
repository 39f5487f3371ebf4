"""Equal-spp A/B: blue-noise vs white-hash sample decorrelation.

Measures what the blue-noise layer (core/bluenoise.py) buys at equal cost:
render the same shadow sequence with blue-noise (default) and with the old
white PCG hash (KAJIYA_NO_BLUENOISE=1), compare each frame's DENOISED sun
shadow against a 256-frame converged mean. Blue noise pushes penumbra error
into high spatial frequencies, which the a-trous denoiser removes — the
residual RMSE after denoise is the honest metric (reference motivation:
`blue_noise.hlsl` feeding `trace_sun_shadow_mask.rgen.hlsl`).

Run on CPU:  PALLAS_AXON_POOL_IPS= python tools/compare_bluenoise.py
(spawns its own A/B child processes; prints an RMSE table.)
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

W, H, FRAMES, CONVERGE = 128, 96, 8, 256


def run_variant(no_bluenoise: bool):
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env.pop("KAJIYA_NO_BLUENOISE", None)
    if no_bluenoise:
        env["KAJIYA_NO_BLUENOISE"] = "1"
    out = subprocess.run(
        [sys.executable, "-c", CHILD], env=env, capture_output=True,
        text=True, cwd=REPO)
    if out.returncode != 0:
        print(out.stderr[-2000:], file=sys.stderr)
        raise SystemExit("variant failed")
    return json.loads(out.stdout.strip().splitlines()[-1])


CHILD = f"""
import jax
jax.config.update("jax_platforms", "cpu")
import json
import numpy as np
import jax.numpy as jnp
from kajiya_tpu.core.camera import make_view_constants
from kajiya_tpu.renderers import shadows
from kajiya_tpu.renderers.gbuffer import raytrace_gbuffer
from kajiya_tpu.renderers.reprojection import calculate_reprojection_map
from kajiya_tpu.scene.procedural import cornell_box
from kajiya_tpu.scene.scene import build_gpu_scene
from kajiya_tpu.world import build_trace_scene

W, H, FRAMES, CONVERGE = {W}, {H}, {FRAMES}, {CONVERGE}
gpu = build_gpu_scene(cornell_box())
ts, levels = build_trace_scene(gpu)
view = make_view_constants((0, 0, 2.4), (0, 0, -1), fov_y_deg=55.0,
                           width=W, height=H)
gb = raytrace_gbuffer(ts, view, W, H, max_trace_steps=256)
reproj = calculate_reprojection_map(gb, gb["depth"], view)

mask_f = jax.jit(lambda i: shadows.trace_sun_shadow_mask(
    ts, gb, i, max_trace_steps=256))
den_f = jax.jit(lambda m, st: shadows.denoise(m, st, reproj, gb))

ref = np.zeros((H, W), np.float64)          # converged raw-mask mean
for i in range(CONVERGE):
    ref += np.asarray(mask_f(jnp.asarray(1000 + i)))
ref /= CONVERGE

st = shadows.init_state(H, W)
raw_rmse, den_rmse = [], []
for i in range(FRAMES):
    m = mask_f(jnp.asarray(i))
    raw_rmse.append(float(np.sqrt(np.mean((np.asarray(m) - ref) ** 2))))
    filt, st = den_f(m, st)
    den_rmse.append(float(np.sqrt(np.mean((np.asarray(filt) - ref) ** 2))))
print(json.dumps(dict(raw=raw_rmse, den=den_rmse)))
"""


def main():
    bn = run_variant(False)
    wh = run_variant(True)
    print(f"{'frame':>5} {'raw_white':>10} {'raw_blue':>10} "
          f"{'den_white':>10} {'den_blue':>10}")
    for i in range(FRAMES):
        print(f"{i:>5} {wh['raw'][i]:>10.4f} {bn['raw'][i]:>10.4f} "
              f"{wh['den'][i]:>10.4f} {bn['den'][i]:>10.4f}")
    import numpy as np

    gain = np.mean(wh["den"]) / max(np.mean(bn["den"]), 1e-9)
    print(f"\nmean denoised RMSE: white {np.mean(wh['den']):.4f}  "
          f"blue {np.mean(bn['den']):.4f}  (gain {gain:.2f}x)")


if __name__ == "__main__":
    main()
