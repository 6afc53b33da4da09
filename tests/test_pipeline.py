"""The unified production pipeline (audiblelight_tpu.pipeline).

Asserts that Scene.generate(compiled=True), the pipelined dataset driver and
the classic per-event path all produce the same audio (reference has one
path, synthesize.py:613-677; here the compiled path IS the production and
bench path, so its parity is CI-enforced).
"""

import numpy as np
import pytest

from audiblelight_tpu import Scene
from audiblelight_tpu.io.audio import wav_read, wav_write
from audiblelight_tpu.pipeline import (
    render_scene_audio_compiled,
    render_scenes_pipelined,
)

SR = 44100


@pytest.fixture(scope="module")
def fg_dir(tmp_path_factory):
    rng = np.random.default_rng(1)
    root = tmp_path_factory.mktemp("fg")
    for cls, freq in [("maleSpeech", 220.0), ("music", 660.0)]:
        d = root / cls
        d.mkdir()
        t = np.arange(SR * 3) / SR
        sig = 0.5 * np.sin(2 * np.pi * freq * t) * np.exp(-t * 0.5)
        sig += 0.01 * rng.standard_normal(len(t))
        wav_write(d / f"{cls}.wav", sig.astype(np.float32), SR)
    return root


def make_scene(fg_dir, seed=0):
    scene = Scene(
        duration=8.0,
        backend="shoebox",
        fg_path=fg_dir,
        backend_kwargs=dict(
            dimensions=[6.0, 4.0, 3.0], max_order=4, max_ir_length=0.15,
            frequency_bands=1, seed=seed,
        ),
    )
    scene.add_microphone(microphone_type="ambeovr", position=[3.0, 2.0, 1.5], alias="m")
    # Explicit filepaths: the scene-level "pick a random fg file" draw comes
    # from an unseeded stream, and these parity tests build several Scenes
    scene.add_event(
        event_type="static", position=[1.0, 1.0, 1.0], alias="s0",
        scene_start=1.0, event_start=0.0, duration=2.0, snr=10.0,
        filepath=fg_dir / "maleSpeech" / "maleSpeech.wav",
    )
    scene.add_event(
        event_type="moving", alias="m0", shape="linear",
        scene_start=4.0, event_start=0.0, duration=2.0, snr=8.0,
        spatial_velocity=1.0, spatial_resolution=2.0,
        filepath=fg_dir / "music" / "music.wav",
    )
    scene.add_ambience(noise="pink")
    return scene


def _classic_audio(scene):
    from audiblelight_tpu.synthesize import (
        generate_scene_audio_from_events,
        render_audio_for_all_scene_events,
    )

    render_audio_for_all_scene_events(scene)
    generate_scene_audio_from_events(scene)
    return scene.audio["m"]


def test_compiled_path_matches_classic(fg_dir):
    ref = _classic_audio(make_scene(fg_dir))
    out = render_scene_audio_compiled(make_scene(fg_dir))["m"]
    assert out.shape == ref.shape
    scale = np.abs(ref).max()
    assert np.max(np.abs(out - ref)) / scale < 5e-3  # int16 stem quantisation


def test_scene_generate_compiled_writes_same_wavs(fg_dir, tmp_path):
    a = tmp_path / "classic"
    b = tmp_path / "compiled"
    a.mkdir(), b.mkdir()
    make_scene(fg_dir).generate(
        output_dir=a, audio=True, metadata_json=True, metadata_dcase=True
    )
    make_scene(fg_dir).generate(
        output_dir=b, audio=True, metadata_json=True, metadata_dcase=True,
        compiled=True,
    )
    wav_a, sr_a = wav_read(a / "audio_out_m.wav")
    wav_b, sr_b = wav_read(b / "audio_out_m.wav")
    assert sr_a == sr_b and wav_a.shape == wav_b.shape
    scale = np.abs(wav_a).max()
    assert np.max(np.abs(wav_a - wav_b)) / scale < 5e-3
    # metadata side outputs identical
    assert (a / "metadata_out_m.csv").read_text() == (b / "metadata_out_m.csv").read_text()


def make_rlr_scene(fg_dir, seed=0):
    """Ray-traced backend scene: exercises the DEVICE-resident IR plan path
    (trace_irs_device -> build_scene_plan packs IRs without a host round trip)."""
    from audiblelight_tpu.geometry.mesh import box_mesh

    scene = Scene(
        duration=6.0, sample_rate=24000, backend="rlr",
        fg_path=fg_dir,
        backend_kwargs=dict(
            mesh=box_mesh(extents=[6.0, 4.0, 3.0], center=[3.0, 2.0, 1.5]),
            seed=seed,
            rlr_kwargs=dict(
                indirect_ray_count=200, indirect_ray_depth=6, max_ir_length=0.15,
                diffraction=False,  # parity default ON; pinned off for CPU test speed
            ),
        ),
    )
    scene.add_microphone(microphone_type="ambeovr", position=[3.0, 2.0, 1.5], alias="m")
    scene.add_event(
        event_type="static", position=[1.0, 1.0, 1.0], alias="s0",
        scene_start=1.0, event_start=0.0, duration=2.0, snr=10.0,
        filepath=fg_dir / "maleSpeech" / "maleSpeech.wav",
    )
    scene.add_event(
        event_type="moving", alias="m0", shape="linear",
        scene_start=3.0, event_start=0.0, duration=2.0, snr=8.0,
        spatial_velocity=1.0, spatial_resolution=2.0,
        filepath=fg_dir / "music" / "music.wav",
    )
    return scene


def test_compiled_path_matches_classic_rlr(fg_dir):
    """Device-IR plan packing equals the classic numpy path on the ray-traced
    backend (identical tracer PRNG: both scenes are constructed identically)."""
    ref_scene = make_rlr_scene(fg_dir)
    from audiblelight_tpu.synthesize import (
        generate_scene_audio_from_events,
        render_audio_for_all_scene_events,
    )

    render_audio_for_all_scene_events(ref_scene)
    generate_scene_audio_from_events(ref_scene)
    ref = ref_scene.audio["m"]

    out = render_scene_audio_compiled(make_rlr_scene(fg_dir))["m"]
    assert out.shape == ref.shape
    scale = np.abs(ref).max()
    assert np.max(np.abs(out - ref)) / scale < 5e-3


def test_trace_irs_device_cached(fg_dir):
    scene = make_rlr_scene(fg_dir)
    d1 = scene.state.trace_irs_device()
    d2 = scene.state.trace_irs_device()
    assert d1["m"] is d2["m"]  # second call returns the cached device arrays
    scene.state.add_emitter(alias="extra", position=[2.0, 3.0, 1.0], keep_existing=True)
    d3 = scene.state.trace_irs_device()
    assert d3["m"].shape[1] == d1["m"].shape[1] + 1  # cache invalidated


def test_render_scenes_pipelined_matches_single(fg_dir):
    scenes = [make_scene(fg_dir, seed=i) for i in range(3)]
    singles = [render_scene_audio_compiled(make_scene(fg_dir, seed=i))["m"] for i in range(3)]
    got = {}

    def complete(scene, audio):
        got[id(scene)] = audio["m"]

    n = render_scenes_pipelined(iter(scenes), complete, max_in_flight=2)
    assert n == 3
    outs = [got[id(s)] for s in scenes]
    for single, out in zip(singles, outs):
        np.testing.assert_allclose(single, out, atol=1e-7)


# ---------------------------------------------------------------------------
# Fused single-dispatch renderer (trace + stems in ONE device program)
# ---------------------------------------------------------------------------

PLAN_KW = dict(max_static=2, max_moving=1, max_traj=8, pad_audio_seconds=2.0)


@pytest.fixture(scope="module")
def scan_mesh():
    from audiblelight_tpu.geometry.mesh import scanned_like_room

    return scanned_like_room(extents=(6.0, 4.0, 3.0), seed=0)


def make_scanned_scene(fg_dir, scan_mesh, seed=0):
    """Nonconvex occlusion-on scene (the bench headline regime, small)."""
    scene = Scene(
        duration=6.0, sample_rate=24000, backend="rlr",
        fg_path=fg_dir,
        backend_kwargs=dict(
            mesh=scan_mesh, seed=seed,
            rlr_kwargs=dict(
                indirect_ray_count=200, indirect_ray_depth=6,
                max_ir_length=0.15, mesh_simplification=True,
                diffraction=False,  # parity default ON; pinned off for CPU test speed
            ),
        ),
    )
    scene.add_microphone(microphone_type="ambeovr", alias="m")
    scene.add_event(
        event_type="static", alias="s0",
        scene_start=1.0, event_start=0.0, duration=2.0, snr=10.0,
        filepath=fg_dir / "maleSpeech" / "maleSpeech.wav",
        max_place_attempts=200,
    )
    scene.add_event(
        event_type="moving", alias="m0", shape="linear",
        scene_start=3.0, event_start=0.0, duration=2.0, snr=8.0,
        spatial_velocity=1.0, spatial_resolution=2.0,
        filepath=fg_dir / "music" / "music.wav",
        max_place_attempts=200,
    )
    return scene


def test_fused_renderer_matches_plan_path(fg_dir, scan_mesh):
    """With the SAME tracer key, the fused single-dispatch program produces
    the plan path's stems up to XLA reassociation (~1e-3 of int16 full scale)."""
    import jax

    from audiblelight_tpu.pipeline import FusedSceneRenderer, stems_from_plan
    from audiblelight_tpu.render import build_scene_plan

    scene = make_scanned_scene(fg_dir, scan_mesh)
    ws = scene.state
    ws._key = jax.random.PRNGKey(123)
    plan = build_scene_plan(scene, **PLAN_KW)
    q0, s0 = stems_from_plan(plan)

    plan_nt = build_scene_plan(scene, trace=False, **PLAN_KW)
    # no trace: the IR banks are zero-LENGTH placeholders (bucket dims only)
    assert plan_nt.static_irs.shape[-1] == 0
    assert plan_nt.moving_irs.shape[-1] == 0
    assert plan_nt.moving_irs.shape[2] == plan.moving_irs.shape[2]  # j kept
    renderer = FusedSceneRenderer(scene, plan_nt)
    assert renderer.compatible(scene, plan_nt)
    ws._key = jax.random.PRNGKey(123)
    q1, s1 = renderer(scene, plan_nt)

    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), rtol=2e-3)
    diff = np.abs(np.asarray(q0, np.int32) - np.asarray(q1, np.int32)).max()
    assert diff <= 64, f"fused stems diverge from plan path: {diff} LSBs"


def test_render_scenes_pipelined_fused_matches(fg_dir, scan_mesh):
    """fused=True end-to-end: same audio as the plan pipeline (same PRNG key
    walk), one compiled program reused across scenes, fallback not triggered."""

    def collect(fused):
        np.random.seed(7)  # ambience beds draw from the global stream
        scenes = [make_scanned_scene(fg_dir, scan_mesh, seed=i) for i in range(2)]
        for s in scenes:
            s.add_ambience(noise="gaussian")
        got = {}

        def complete(scene, audio):
            got[id(scene)] = audio["m"]

        n = render_scenes_pipelined(
            iter(scenes), complete, plan_kwargs=PLAN_KW, fused=fused
        )
        assert n == 2
        return [got[id(s)] for s in scenes]

    ref = collect(False)
    out = collect(True)
    for r, o in zip(ref, out):
        assert r.shape == o.shape
        scale = np.abs(r).max()
        assert np.max(np.abs(r - o)) / scale < 1e-2


def test_pipeline_renderer_cache_survives_calls(fg_dir, scan_mesh):
    """The renderer LRU is module-wide: a second render_scenes_pipelined call
    over the same mesh + rig reuses the compiled template (dataset drivers
    invoke the pipeline in resume/retry chunks), while a rig change on the
    same mesh builds a fresh template instead of shadowing the old key."""
    from audiblelight_tpu import pipeline as pl

    pl._PIPELINE_RENDERERS.clear()

    def run(seed, mic="ambeovr"):
        scene = make_scanned_scene(fg_dir, scan_mesh, seed=seed)
        if mic != "ambeovr":
            scene.state.microphones.clear()
            scene.state.add_microphone(microphone_type=mic, alias="m")
        got = {}
        n = render_scenes_pipelined(
            iter([scene]),
            lambda s, a: got.__setitem__(id(s), a["m"]),
            plan_kwargs=PLAN_KW,
            fused=True,
        )
        assert n == 1
        return got.popitem()[1]

    run(0)
    assert len(pl._PIPELINE_RENDERERS) == 1
    first = next(iter(pl._PIPELINE_RENDERERS.values()))
    out = run(1)
    assert next(iter(pl._PIPELINE_RENDERERS.values())) is first
    assert out.ndim == 2 and np.abs(out).max() > 0
    # Different rig, same mesh: a second template coexists with the first.
    out_mono = run(2, mic="monocapsule")
    assert len(pl._PIPELINE_RENDERERS) == 2
    assert out_mono.shape[0] != out.shape[0]


def test_render_batch_sharded_over_mesh(fg_dir, scan_mesh):
    """Multi-chip dataset path: 8 scenes sharded over the 8-device mesh
    through the fused program match the per-scene single-device renders
    exactly (same captured inputs), and the output spans every device."""
    import jax
    from jax.sharding import Mesh

    from audiblelight_tpu.pipeline import FusedSceneRenderer
    from audiblelight_tpu.render import build_scene_plan

    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    mesh = Mesh(np.array(devs[:8]), ("scene",))

    scenes = [make_scanned_scene(fg_dir, scan_mesh, seed=10 + i) for i in range(8)]
    plans = [build_scene_plan(s, trace=False, **PLAN_KW) for s in scenes]
    renderer = FusedSceneRenderer(scenes[0], plans[0])
    inputs = [renderer.scene_inputs(s) for s in scenes]

    q_b, s_b = renderer.render_batch_sharded(inputs, plans, mesh)
    assert q_b.shape[0] == 8 and s_b.shape[0] == 8
    # The batch really lives across the mesh
    assert len(q_b.sharding.device_set) == 8

    for i in (0, 3, 7):
        q1, s1 = renderer._render(*inputs[i], *renderer.plan_args(plans[i]))
        np.testing.assert_allclose(np.asarray(s_b[i]), np.asarray(s1), rtol=2e-3)
        diff = np.abs(
            np.asarray(q_b[i], np.int32) - np.asarray(q1, np.int32)
        ).max()
        assert diff <= 64, f"sharded stems diverge: {diff} LSBs"


def test_render_scenes_pipelined_fused_batch_matches(fg_dir, scan_mesh):
    """fused_batch micro-batching produces the same audio as per-scene fused
    rendering (same PRNG walk: scene_inputs is consumed in scene order either
    way), including a trailing partial group."""

    def collect(k):
        np.random.seed(11)
        scenes = [make_scanned_scene(fg_dir, scan_mesh, seed=20 + i) for i in range(3)]
        got = {}

        def complete(scene, audio):
            got[id(scene)] = audio["m"]

        n = render_scenes_pipelined(
            iter(scenes), complete, plan_kwargs=PLAN_KW, fused=True,
            fused_batch=k, max_in_flight=2,
        )
        assert n == 3
        return [got[id(s)] for s in scenes]

    ref = collect(1)
    out = collect(2)  # one full pair + one trailing partial
    for a, b in zip(ref, out):
        assert a.shape == b.shape
        scale = max(np.abs(a).max(), 1e-9)
        assert np.max(np.abs(a - b)) / scale < 5e-3


def test_fused_pipeline_bucket_overflow_renders_all_events(fg_dir, scan_mesh):
    """A scene whose event count exceeds the pinned plan buckets must NOT be
    silently truncated by the fused path: compatible() rejects it and the
    fallback rebuilds the plan with auto-sized buckets, so every event's
    audio lands in the mix (ADVICE r3: render.py truncation finding)."""
    from audiblelight_tpu.pipeline import FusedSceneRenderer
    from audiblelight_tpu.render import build_scene_plan

    scene = make_scanned_scene(fg_dir, scan_mesh, seed=42)
    # third static event -> 3 statics + 1 moving, over PLAN_KW's max_static=2
    scene.add_event(
        event_type="static", alias="s1",
        scene_start=4.0, event_start=0.0, duration=1.5, snr=12.0,
        filepath=fg_dir / "maleSpeech" / "maleSpeech.wav",
        max_place_attempts=200,
    )
    scene.add_event(
        event_type="static", alias="s2",
        scene_start=0.5, event_start=0.0, duration=1.5, snr=12.0,
        filepath=fg_dir / "music" / "music.wav",
        max_place_attempts=200,
    )

    plan_trunc = build_scene_plan(scene, trace=False, **PLAN_KW)
    template = make_scanned_scene(fg_dir, scan_mesh, seed=43)
    renderer = FusedSceneRenderer(
        template, build_scene_plan(template, trace=False, **PLAN_KW)
    )
    assert not renderer.compatible(scene, plan_trunc)

    # Reference render: auto-sized plan path (all 4 statics-equivalents kept)
    import jax

    scene.state._key = jax.random.PRNGKey(5)
    ref = render_scene_audio_compiled(scene)["m"]

    # Pipeline render of the SAME scene through fused=True must fall back and
    # keep every event
    scene.state._key = jax.random.PRNGKey(5)
    got = {}
    n = render_scenes_pipelined(
        iter([scene]), lambda s, a: got.update(a), plan_kwargs=PLAN_KW,
        fused=True,
    )
    assert n == 1
    out = got["m"]
    assert out.shape == ref.shape
    scale = max(np.abs(ref).max(), 1e-9)
    assert np.max(np.abs(out - ref)) / scale < 5e-3


def test_render_mix_batch_sharded_over_mesh(fg_dir, scan_mesh):
    """Multi-chip WAV path: 8 scenes' whole-scene-to-WAV programs sharded
    over the 8-device mesh match the single-device mix renders exactly."""
    import jax
    from jax.sharding import Mesh

    from audiblelight_tpu.pipeline import FusedSceneRenderer
    from audiblelight_tpu.render import build_scene_plan

    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    mesh = Mesh(np.array(devs[:8]), ("scene",))

    scenes = [make_scanned_scene(fg_dir, scan_mesh, seed=50 + i) for i in range(8)]
    for s in scenes:
        s.add_ambience(noise="gaussian")
    plans = [
        build_scene_plan(s, trace=False, build_ambience=False, **PLAN_KW)
        for s in scenes
    ]
    renderer = FusedSceneRenderer(scenes[0], plans[0])
    inputs = [renderer.scene_inputs(s) for s in scenes]
    extras = [renderer.mix_args(s, p) for s, p in zip(scenes, plans)]

    q_b = renderer.render_mix_batch_sharded(inputs, plans, extras, mesh)
    assert q_b.shape[0] == 8 and q_b.dtype == np.int16
    assert len(q_b.sharding.device_set) == 8

    for i in (0, 5):
        q1 = renderer._render_mix(
            *inputs[i], *renderer.plan_args(plans[i]), *extras[i]
        )
        diff = np.abs(
            np.asarray(q_b[i], np.int32) - np.asarray(q1, np.int32)
        ).max()
        assert diff <= 1, f"sharded WAV samples diverge: {diff} LSBs"


def test_fused_renderer_honors_measured_hrtf(fg_dir, scan_mesh, tmp_path):
    """ADVICE r4 (medium): FusedSceneRenderer must render the SAME measured-HRIR
    binaural acoustics as the plan path (worldstate/mesh_backend.py loads
    mic.hrtf_sofa), not the analytic spherical-head fallback — and
    compatible() must key on the HRTF set."""
    import jax

    from audiblelight_tpu.micarrays import Binaural
    from audiblelight_tpu.pipeline import FusedSceneRenderer, stems_from_plan
    from audiblelight_tpu.render import build_scene_plan
    from audiblelight_tpu.rir.hrtf import write_hrtf_sofa

    # Coarse measured set with the LEFT ear's polarity inverted — a marker the
    # analytic fallback cannot produce (same construction as tests/test_hrtf.py).
    sr = 24000
    az = np.arange(0, 360, 30, dtype=np.float64)
    el = np.array([-45.0, 0.0, 45.0])
    pairs = [(a, e) for e in el for a in az]
    n = 96
    rng = np.random.default_rng(3)
    hrirs = np.zeros((len(pairs), 2, n))
    for i, (a, e) in enumerate(pairs):
        y = np.cos(np.deg2rad(e)) * np.sin(np.deg2rad(a))
        for ear, sign in ((0, 1.0), (1, -1.0)):
            gain = 0.6 + 0.4 * y * sign
            h = np.sinc(np.arange(n) - 16.0) * np.hanning(n)
            hrirs[i, ear] = (-1.0 if ear == 0 else 1.0) * gain * h / h.sum()
    sofa = write_hrtf_sofa(
        tmp_path / "fixture.sofa",
        hrirs, np.array([p[0] for p in pairs]), np.array([p[1] for p in pairs]),
        sr,
    )

    def binaural_scene(hrtf_path):
        scene = make_scanned_scene(fg_dir, scan_mesh, seed=77)
        scene.state.microphones.clear()
        scene.state.add_microphone(
            Binaural(hrtf_sofa=hrtf_path), alias="m",
        )
        return scene

    def float_stems(out):
        q, scales = out  # int16 stems (E, C, S), per-event scales (E,)
        return np.asarray(q, np.float32) * np.asarray(scales)[:, None, None]

    scene = binaural_scene(str(sofa))
    ws = scene.state
    ws._key = jax.random.PRNGKey(5)
    plan = build_scene_plan(scene, **PLAN_KW)
    s_plan = float_stems(stems_from_plan(plan))
    assert np.abs(s_plan).max() > 0  # the scene actually rendered something

    plan_nt = build_scene_plan(scene, trace=False, **PLAN_KW)
    renderer = FusedSceneRenderer(scene, plan_nt)
    assert renderer.compatible(scene, plan_nt)
    ws._key = jax.random.PRNGKey(5)
    s_fused = float_stems(renderer(scene, plan_nt))
    scale = np.abs(s_plan).max()
    assert np.max(np.abs(s_plan - s_fused)) / scale < 5e-3

    # A renderer compiled WITHOUT the measured set must not serve this scene
    # (and vice versa): the HRTF is a captured constant of the program.
    plain = binaural_scene(None)
    plan_plain = build_scene_plan(plain, trace=False, **PLAN_KW)
    renderer_plain = FusedSceneRenderer(plain, plan_plain)
    assert not renderer_plain.compatible(scene, plan_nt)
    assert not renderer.compatible(plain, plan_plain)
    # And the fallback really is different acoustics: the fixture's inverted
    # left-ear polarity only survives if the measured HRIR reached the render.
    plain.state._key = jax.random.PRNGKey(5)
    s_plain = float_stems(stems_from_plan(build_scene_plan(plain, **PLAN_KW)))
    assert np.max(np.abs(s_plain - s_plan)) / scale > 0.05
