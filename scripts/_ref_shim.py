"""Shared builder for the de-CUDA'd reference shim (/tmp/refshim).

Used by the torch-side parity duel scripts (ref_parity_nerf.py,
ref_parity_dtu.py): materializes /root/reference's pytorch3d.pathtracer
with a mechanical "cuda"->"cpu" rewrite plus stubs for its unused
external imports.  Nothing under /root/reference is modified; nothing
reference-derived lands in the repo.  See ref_parity_nerf.py's module
docstring for the full rationale.
"""

import os
import re
import shutil


SHIM = "/tmp/refshim"
REF = "/root/reference/pytorch3d/pathtracer"


def build_shim():
    """Materialize the de-CUDA'd reference package tree under /tmp."""
    if os.path.isdir(SHIM):
        shutil.rmtree(SHIM)
    pkg = os.path.join(SHIM, "pytorch3d")
    os.makedirs(pkg)
    # parent package: must NOT run the real pytorch3d __init__ (it imports
    # the compiled _C extension); an empty namespace is enough because the
    # pathtracer package only imports itself + externals
    open(os.path.join(pkg, "__init__.py"), "w").write("")
    with open(os.path.join(pkg, "renderer.py"), "w") as f:
        f.write(
            "# stub: imported by training_utils.py:10 / utils.py lazy paths;\n"
            "# the train_nerf/test_nerf protocol never instantiates these\n"
            "class OpenGLPerspectiveCameras:\n"
            "    def __init__(self, *a, **k):\n"
            "        raise NotImplementedError('renderer stub')\n"
            "def look_at_view_transform(*a, **k):\n"
            "    raise NotImplementedError('renderer stub')\n"
            "def look_at_rotation(*a, **k):\n"
            "    raise NotImplementedError('renderer stub')\n")
    for root, _dirs, files in os.walk(REF):
        rel = os.path.relpath(root, REF)
        dst_dir = os.path.join(pkg, "pathtracer",
                               "" if rel == "." else rel)
        os.makedirs(dst_dir, exist_ok=True)
        for name in files:
            if not name.endswith(".py"):
                continue
            src = open(os.path.join(root, name)).read()
            # the one CPU-enabling rewrite; covers device="cuda" defaults,
            # module-level cuda tensors (utils.py:188-190, interaction.py:64)
            src = src.replace('"cuda"', '"cpu"').replace("'cuda'", "'cpu'")
            # py3.12 compat: bare @dataclass (eq=True) makes instances
            # unhashable, and py3.12 rejects unhashable class-attribute
            # defaults (lights.py:115 Sphere(...)); eq=False restores the
            # py3.8-era behavior these classes were written against
            src = re.sub(r"@dataclass\b(?!\()", "@dataclass(eq=False)", src)
            open(os.path.join(dst_dir, name), "w").write(src)
    # torchvision: main.py:8 imports rotate but nothing calls it
    tv = os.path.join(SHIM, "torchvision", "transforms")
    os.makedirs(tv)
    open(os.path.join(SHIM, "torchvision", "__init__.py"), "w").write("")
    open(os.path.join(tv, "__init__.py"), "w").write("")
    open(os.path.join(tv, "functional.py"), "w").write(
        "def rotate(*a, **k):\n"
        "    raise NotImplementedError('torchvision stub')\n")
    with open(os.path.join(SHIM, "pytorch_msssim.py"), "w") as f:
        f.write('''\
"""pytorch_msssim shim: ssim() matching the real package (gaussian-11 /
sigma-1.5 / valid conv / K=(0.01,0.03)); cross-checked bit-exact in
scripts/ssim_probe.py.  NCHW inputs."""
import torch
import torch.nn.functional as F


def ssim(x, y, data_range=1.0, size_average=True, win_size=11,
         win_sigma=1.5, K=(0.01, 0.03), nonnegative_ssim=False):
    coords = torch.arange(win_size, dtype=x.dtype,
                          device=x.device) - win_size // 2
    g = torch.exp(-coords.square() / (2.0 * win_sigma * win_sigma))
    g = g / g.sum()
    c = x.shape[1]
    kh = g.reshape(1, 1, win_size, 1).expand(c, 1, win_size, 1)
    kw = g.reshape(1, 1, 1, win_size).expand(c, 1, 1, win_size)

    def blur(t):
        return F.conv2d(F.conv2d(t, kh, groups=c), kw, groups=c)

    c1 = (K[0] * data_range) ** 2
    c2 = (K[1] * data_range) ** 2
    mu_x, mu_y = blur(x), blur(y)
    sxx = blur(x * x) - mu_x * mu_x
    syy = blur(y * y) - mu_y * mu_y
    sxy = blur(x * y) - mu_x * mu_y
    cs = (2.0 * sxy + c2) / (sxx + syy + c2)
    lum = (2.0 * mu_x * mu_y + c1) / (mu_x * mu_x + mu_y * mu_y + c1)
    out = lum * cs
    if nonnegative_ssim:
        out = out.relu()
    per_image = out.flatten(1).mean(-1)
    return per_image.mean() if size_average else per_image


def ms_ssim(x, y, data_range=1.0, size_average=True, **kw):
    weights = [0.0448, 0.2856, 0.3001, 0.2363, 0.1333]
    vals = []
    for i, _w in enumerate(weights):
        coords = torch.arange(11, dtype=x.dtype, device=x.device) - 5
        g = torch.exp(-coords.square() / (2.0 * 1.5 * 1.5))
        g = g / g.sum()
        c = x.shape[1]
        kh = g.reshape(1, 1, 11, 1).expand(c, 1, 11, 1)
        kw_ = g.reshape(1, 1, 1, 11).expand(c, 1, 1, 11)

        def blur(t):
            return F.conv2d(F.conv2d(t, kh, groups=c), kw_, groups=c)

        c1 = (0.01 * data_range) ** 2
        c2 = (0.03 * data_range) ** 2
        mu_x, mu_y = blur(x), blur(y)
        sxx = blur(x * x) - mu_x * mu_x
        syy = blur(y * y) - mu_y * mu_y
        sxy = blur(x * y) - mu_x * mu_y
        cs = ((2.0 * sxy + c2) / (sxx + syy + c2)).flatten(1).mean(-1)
        lum = ((2.0 * mu_x * mu_y + c1)
               / (mu_x * mu_x + mu_y * mu_y + c1)).flatten(1).mean(-1)
        vals.append(cs if i < len(weights) - 1 else lum * cs)
        if i < len(weights) - 1:
            x = F.avg_pool2d(x, 2)
            y = F.avg_pool2d(y, 2)
    out = torch.ones_like(vals[0])
    for w, v in zip(weights, vals):
        out = out * v.relu() ** w
    return out.mean() if size_average else out
''')
