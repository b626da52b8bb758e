"""Execute the full Viser GUI wiring against a mock viser module.

viser isn't installed in this image, so test_viewer.py's live smoke
skips; this harness fakes the small viser surface launch_viewer uses
(folders, widgets, client handles, SO3 transforms) and drives a client
connect + camera update through the REAL RenderEngine — catching
signature drift in the GUI code paths that would otherwise only run in
viser-enabled environments.
"""
import sys
import types

import numpy as np
import pytest


class _Widget:
    def __init__(self, value=None):
        self.value = value
        self.visible = True
        self._on_update = []
        self._on_click = []

    def on_update(self, fn):
        self._on_update.append(fn)
        return fn

    def on_click(self, fn):
        self._on_click.append(fn)
        return fn

    def click(self):
        for fn in self._on_click:
            fn(None)

    @property
    def content(self):
        return self.value

    @content.setter
    def content(self, v):
        self.value = v


class _Folder(_Widget):
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


class _Gui:
    def __init__(self):
        self.widgets = {}

    def add_folder(self, name, **kw):
        return _Folder()

    def _add(self, name, value):
        w = _Widget(value)
        self.widgets[name] = w
        return w

    def add_dropdown(self, name, options, initial_value=None, **kw):
        return self._add(name, initial_value or options[0])

    def add_slider(self, name, min=0, max=1, step=1, initial_value=0, **kw):
        return self._add(name, initial_value)

    def add_checkbox(self, name, initial_value=False, **kw):
        return self._add(name, initial_value)

    def add_button(self, name, **kw):
        return self._add(name, None)

    def add_number(self, name, initial_value=0, **kw):
        return self._add(name, initial_value)

    def add_text(self, name, initial_value="", **kw):
        return self._add(name, initial_value)

    def add_markdown(self, content="", **kw):
        return self._add(content, content)


class _Camera:
    def __init__(self):
        self.wxyz = np.array([1.0, 0.0, 0.0, 0.0])
        self.position = np.array([0.0, 0.0, 4.0])
        self.fov = 0.9
        self.aspect = 4 / 3
        self._on_update = []

    def on_update(self, fn):
        self._on_update.append(fn)
        return fn

    def fire(self):
        for fn in self._on_update:
            fn(None)


class _Scene:
    def __init__(self):
        self.frames = []

    def set_background_image(self, img, format="jpeg"):
        self.frames.append(np.asarray(img))


class _Client:
    def __init__(self):
        self.camera = _Camera()
        self.scene = _Scene()
        self.gui = _Gui()

    class _Atomic:
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    def atomic(self):
        return self._Atomic()

    def flush(self):
        pass


class _Server:
    def __init__(self, host="0.0.0.0", port=0):
        self.gui = _Gui()
        self.scene = _Scene()
        self._on_connect = []
        self._clients = {}

    def on_client_connect(self, fn):
        self._on_connect.append(fn)
        return fn

    def connect(self):
        c = _Client()
        self._clients[len(self._clients)] = c
        for fn in self._on_connect:
            fn(c)
        return c

    def get_clients(self):
        return self._clients

    def stop(self):
        pass


class _SO3:
    def __init__(self, wxyz):
        w, x, y, z = np.asarray(wxyz, np.float64)
        self._m = np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ])
        self.wxyz = np.asarray(wxyz, np.float64)

    def as_matrix(self):
        return self._m

    @staticmethod
    def from_matrix(m):
        m = np.asarray(m, np.float64)
        t = np.trace(m)
        w = np.sqrt(max(1 + t, 1e-12)) / 2
        x = (m[2, 1] - m[1, 2]) / (4 * w)
        y = (m[0, 2] - m[2, 0]) / (4 * w)
        z = (m[1, 0] - m[0, 1]) / (4 * w)
        return _SO3([w, x, y, z])


@pytest.fixture
def mock_viser(monkeypatch):
    viser = types.ModuleType("viser")
    viser.ViserServer = _Server
    viser.ClientHandle = _Client
    tf = types.ModuleType("viser.transforms")
    tf.SO3 = _SO3
    viser.transforms = tf
    monkeypatch.setitem(sys.modules, "viser", viser)
    monkeypatch.setitem(sys.modules, "viser.transforms", tf)
    return viser


def _tiny_ctx(tmp_path):
    import jax
    import jax.numpy as jnp

    from nerfsys_tpu.models.container import (
        ContainerConfig,
        ContainerStatics,
        init_container_params,
    )
    from nerfsys_tpu.models.ngp import NGPConfig
    from nerfsys_tpu.ops.encodings import HashGridConfig
    from nerfsys_tpu.utils.config import parse_args

    cfg = ContainerConfig(
        num_experts=2,
        expert=NGPConfig(hidden=16, sigma_depth=1, color_hidden=16,
                         color_depth=1, geo_feat_dim=7,
                         hash=HashGridConfig(levels=2, min_res=4, max_res=8,
                                             log2_hashmap_size=8)),
        bg_hidden=8,
    )
    cents = jnp.array([[0.0, -0.5, 0.0], [0.0, 0.5, 0.0]], jnp.float32)
    boxes = jnp.stack([jnp.stack([c - 1.0, c + 1.0]) for c in cents])
    statics = ContainerStatics(
        cents, boxes, jnp.array([[-1.5, -1.5, -1.5], [1.5, 1.5, 1.5]])
    )
    P = parse_args(["--op", "view", "--data_path", str(tmp_path),
                    "--ray_samples", "8"])
    return {
        "P": P, "cfg": cfg, "statics": statics,
        "params": init_container_params(jax.random.PRNGKey(0), cfg),
        "global_aabb": np.array([[-1.5] * 3, [1.5] * 3], np.float32),
        "run_dir": tmp_path,
    }


def test_launch_viewer_wiring_and_render(mock_viser, tmp_path):
    from nerfsys_tpu.viewer.viewer import launch_viewer

    ctx = _tiny_ctx(tmp_path)
    server, ctrl, engine = launch_viewer(ctx, port=0, blocking=False)
    try:
        client = server.connect()
        # per-client camera control buttons exist
        names = set(client.gui.widgets)
        for btn in ("Look At Center", "Look Front", "Look Right",
                    "Look Down", "Dolly In", "Dolly Out",
                    "Save Screenshot"):
            assert btn in names, f"missing camera button {btn}"

        # a camera update renders a frame through the real engine
        server.gui.widgets["Max resolution"].value = 64
        server.gui.widgets["Samples/ray"].value = 8
        client.camera.fire()
        assert client.scene.frames, "no frame rendered"
        frame = client.scene.frames[-1]
        assert frame.dtype == np.uint8 and frame.shape[2] == 3

        # camera buttons re-pose the client using the last rendered pose
        pos_before = np.asarray(client.camera.position).copy()
        client.gui.widgets["Dolly In"].click()
        assert not np.allclose(client.camera.position, pos_before)
        client.gui.widgets["Look At Center"].click()

        # screenshot writes a PNG under run_dir/snapshots
        client.gui.widgets["Save Screenshot"].click()
        snaps = list((tmp_path / "snapshots").glob("*.png"))
        assert len(snaps) == 1

        # metric near/far clipping path executes
        server.gui.widgets["Override Near/Far"].value = True
        client.camera.fire()
        assert len(client.scene.frames) >= 2

        # display-mode switch toggles the depth tonemap folder + renders
        server.gui.widgets["Display"].value = "depth"
        for fn in server.gui.widgets["Display"]._on_update:
            fn(None)
        client.camera.fire()
    finally:
        ctrl.stop(join=False)
        server.stop()


def test_launch_viewer_baked_serving_flow(mock_viser, tmp_path):
    """Serving controls: enable-while-idle bakes immediately; Pause bakes
    when the checkbox is on (bake-on-pause); an adapt step's new params
    snapshot invalidates on the next render; unchecking drops it."""
    from nerfsys_tpu.viewer.viewer import launch_viewer

    ctx = _tiny_ctx(tmp_path)
    server, ctrl, engine = launch_viewer(ctx, port=0, blocking=False)
    try:
        w = server.gui.widgets
        assert "Baked serving (bake on pause)" in w
        w["Bake resolution"].value = 16

        # enable while idle -> bake immediately
        w["Baked serving (bake on pause)"].value = True
        for fn in w["Baked serving (bake on pause)"]._on_update:
            fn(None)
        assert engine.baked_active

        client = server.connect()
        w["Max resolution"].value = 32
        w["Samples/ray"].value = 8
        client.camera.fire()
        assert client.scene.frames[-1].dtype == np.uint8
        assert engine.baked_active  # same params snapshot -> still serving

        # switch to Runtime-Adapt: the runner starts from the SAME params
        # object (no step yet), so the snapshot keeps serving
        w["Mode"].value = "Runtime-Adapt"
        for fn in w["Mode"]._on_update:
            fn(None)
        client.camera.fire()
        assert engine.baked_active

        # a step lands a NEW params snapshot -> next render invalidates
        # (simulated the way RuntimeAdaptRunner.step publishes: replace
        # self.params under model_lock with a fresh pytree)
        import jax

        from nerfsys_tpu.viewer.engine.runners.base import model_lock

        with model_lock:
            ctrl.runner.params = jax.tree.map(lambda x: x,
                                              ctrl.runner.params)
        client.camera.fire()
        assert not engine.baked_active

        # Pause with the checkbox on re-bakes from the adapted snapshot
        w["Pause"].click()
        assert engine.baked_active
        assert "baked" in str(w["status: idle"].value)

        # unchecking drops the snapshot
        w["Baked serving (bake on pause)"].value = False
        for fn in w["Baked serving (bake on pause)"]._on_update:
            fn(None)
        assert not engine.baked_active
    finally:
        ctrl.stop(join=False)
        server.stop()


def test_bake_respects_occ_toggle(mock_viser, tmp_path, monkeypatch):
    """Interactive bakes follow the 'Occupancy sampling' GUI toggle
    (ADVICE r3): with the toggle off, _bake_now must NOT thread the occ
    state into bake_field (the occ bake hard-zeros dead cells, which a
    soft-trained checkpoint's user may want to opt out of)."""
    import jax.numpy as jnp

    from nerfsys_tpu.ops.occupancy import OccGridConfig, init_occ_state
    from nerfsys_tpu.viewer.viewer import launch_viewer

    ctx = _tiny_ctx(tmp_path)
    ctx["occ_state"] = init_occ_state(
        OccGridConfig(resolution=8, levels=1, warmup_steps=0), 2)

    seen = []

    def fake_bake_field(params, cfg, statics, bcfg, *, occ_state=None, **kw):
        seen.append(occ_state is not None)
        n = bcfg.resolution ** 3
        return {"table": jnp.zeros((n, 2 * bcfg.padded_channels),
                                   jnp.bfloat16),
                "aabb": jnp.asarray([[-1.5] * 3, [1.5] * 3], jnp.float32)}

    import nerfsys_tpu.models.baked as baked_mod
    monkeypatch.setattr(baked_mod, "bake_field", fake_bake_field)

    server, ctrl, engine = launch_viewer(ctx, port=0, blocking=False)
    try:
        w = server.gui.widgets
        w["Bake resolution"].value = 4
        assert engine.use_occ  # occ checkpoint -> toggle defaults on

        # toggle ON (default): the bake threads the occ state
        w["Baked serving (bake on pause)"].value = True
        for fn in w["Baked serving (bake on pause)"]._on_update:
            fn(None)
        assert seen == [True]

        # toggle OFF -> re-bake must go dense
        w["Occupancy sampling"].value = False
        for fn in w["Occupancy sampling"]._on_update:
            fn(None)
        assert not engine.use_occ
        w["Pause"].click()  # bake-on-pause with the checkbox on
        assert seen == [True, False]
    finally:
        ctrl.stop(join=False)
        server.stop()
