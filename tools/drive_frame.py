import os as _os, sys; sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np
from kajiya_tpu.core.camera import make_view_constants
from kajiya_tpu.frame import RenderConfig, Renderer
from kajiya_tpu.scene.procedural import cornell_box

W, H = 256, 192
cfg = RenderConfig(width=W, height=H, max_trace_steps=256)
r = Renderer(cornell_box(), cfg)
view = make_view_constants((0.0, 0.0, 2.4), (0.0, 0.0, -1.0),
                           fov_y_deg=55.0, width=W, height=H)
for i in range(4):
    out = r.draw(view)
f = np.asarray(out["final"])
print("final:", f.shape, "finite:", np.isfinite(f).all(), "mean:", f.mean())
from PIL import Image
Image.fromarray((np.clip(f, 0, 1) * 255).astype(np.uint8)).save("/tmp/verify_frame.png")
print("saved /tmp/verify_frame.png")
