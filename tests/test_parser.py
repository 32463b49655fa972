"""Scene parser + loader tests against the reference's shipped assets
(/root/reference/resources — test data only; skipped when absent)."""

import os

import numpy as np
import pytest

SCENES = "/root/reference/resources/scene"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SCENES), reason="reference scenes not mounted"
)


def test_cornell_box_config():
    from mcpt_tpu.scene.parser import load_config
    from mcpt_tpu.scene.ir import BsdfType

    cfg = load_config(f"{SCENES}/cornell-box/scene_v0.6.xml")
    assert (cfg.camera.width, cfg.camera.height) == (1024, 1024)
    assert cfg.camera.spp == 256
    assert cfg.camera.fov_x == pytest.approx(19.5)
    np.testing.assert_allclose(cfg.camera.eye, [0, 1, 6.8], atol=1e-6)
    np.testing.assert_allclose(cfg.camera.look_at, [0, 1, 5.8], atol=1e-6)
    assert cfg.integrator.itype == "path"
    assert cfg.integrator.depth_max == 65
    assert len(cfg.instances) == 8
    # last shape carries the inline area emitter
    light_bsdf = cfg.bsdfs[cfg.instances[-1].id_bsdf]
    assert light_bsdf.btype == BsdfType.AREA_LIGHT


def test_matpreview_configs():
    from mcpt_tpu.scene.parser import load_config
    from mcpt_tpu.scene.ir import BsdfType

    for xml, btype in [
        ("rough_conductor_isotropic.xml", BsdfType.CONDUCTOR),
        ("dielectric.xml", BsdfType.DIELECTRIC),
        ("thin_dielectric.xml", BsdfType.THIN_DIELECTRIC),
        ("plastic.xml", BsdfType.PLASTIC),
    ]:
        path = f"{SCENES}/matpreview/{xml}"
        if not os.path.exists(path):
            continue
        cfg = load_config(path)
        types = {b.btype for b in cfg.bsdfs}
        assert btype in types, f"{xml}: {types}"
        assert len(cfg.instances) >= 2  # serialized mesh shapes


def test_serialized_loader_shapes():
    from mcpt_tpu.scene.loaders import load_mesh

    m0 = load_mesh(f"{SCENES}/matpreview/matpreview.serialized", shape_index=0)
    m1 = load_mesh(f"{SCENES}/matpreview/matpreview.serialized", shape_index=1)
    assert m0.positions.shape[1] == 3
    assert m1.indices.shape[1] == 3
    assert m0.positions.shape[0] != m1.positions.shape[0]
    assert np.isfinite(m0.positions).all()


def test_obj_loader():
    from mcpt_tpu.scene.loaders import load_mesh

    path = f"{SCENES}/classroom/models/Mesh064.obj"
    if not os.path.exists(path):
        pytest.skip("classroom assets absent")
    m = load_mesh(path)
    assert m.positions.shape[0] > 100
    assert m.indices.max() < m.positions.shape[0]
    assert m.normals is not None and m.texcoords is not None


def test_volumetric_caustic_config():
    from mcpt_tpu.scene.parser import load_config

    path = f"{SCENES}/volumetric-caustic/scene_v0.6.xml"
    if not os.path.exists(path):
        pytest.skip("scene absent")
    cfg = load_config(path)
    assert cfg.integrator.itype == "volpath"
    assert len(cfg.media) >= 1
    assert any(
        i.id_medium_int >= 0 or i.id_medium_ext >= 0 for i in cfg.instances
    )


def test_hosek_sky_model_sanity():
    from mcpt_tpu.scene import hosek

    # the C reference comparison lives in the build log; here: shape,
    # positivity, and sun-glow monotonicity
    bitmap = hosek.sky_bitmap(
        np.array([0.3, -0.8, 0.2]), turbidity=3.0, width=64, height=32
    )
    assert bitmap.shape == (32, 64, 3)
    assert (bitmap >= 0).all() and np.isfinite(bitmap).all()
    assert bitmap.max() > bitmap[..., :].mean() * 2  # bright circumsolar


def test_sun_direction_ephemeris():
    from mcpt_tpu.scene.sun_sky import sun_direction_from_time

    # noon in Tokyo in July: sun high in the sky -> light travels downward
    d = sun_direction_from_time(2010, 7, 10, 12, 0, 0, 35.69, 139.69, 9)
    assert d[1] < -0.7
    # midnight: sun below horizon -> light travels upward
    d = sun_direction_from_time(2010, 7, 10, 0, 0, 0, 35.69, 139.69, 9)
    assert d[1] > 0.0


def test_transform_rotate_partial_axis_attrs():
    """<rotate y=1 angle=90> must rotate about +y even though x/z attrs
    are absent (the bug class: missing-attr defaults, parser.cpp:1490)."""
    import xml.etree.ElementTree as ET

    from mcpt_tpu.scene.parser import _Ctx, _read_transform

    node = ET.fromstring(
        '<transform><rotate y="1" angle="90"/></transform>'
    )
    m = _read_transform(_Ctx("/tmp"), node)
    # +z rotates to +x under a right-handed +90deg rotation about y
    np.testing.assert_allclose(m[:3, :3] @ [0, 0, 1], [1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(m[:3, :3] @ [0, 1, 0], [0, 1, 0], atol=1e-6)


def test_transform_composition_order():
    """Children left-multiply in document order (parser.cpp:1565-1617)."""
    import xml.etree.ElementTree as ET

    from mcpt_tpu.scene.parser import _Ctx, _read_transform

    node = ET.fromstring(
        '<transform><scale value="2"/><translate x="1"/></transform>'
    )
    m = _read_transform(_Ctx("/tmp"), node)
    # point (1,0,0): scale -> (2,0,0), then translate -> (3,0,0)
    np.testing.assert_allclose(
        (m @ [1, 0, 0, 1])[:3], [3, 0, 0], atol=1e-6
    )


def test_checkerboard_to_uv_transform():
    """Mitsuba-2 style `<transform name="to_uv"><scale/></transform>`
    on textures must populate the uv transform (matpreview ground plane
    uses it; a miss renders the checkerboard as one flat color)."""
    import os

    scene = (
        "/root/reference/resources/scene/matpreview/"
        "rough_conductor_isotropic.xml"
    )
    if not os.path.exists(scene):
        pytest.skip("reference scenes not mounted")
    from mcpt_tpu.scene.parser import load_config

    cfg = load_config(scene)
    checkers = [
        t for t in cfg.textures.infos if t.get("type") == 2
    ]
    assert checkers and np.allclose(
        checkers[0]["uv_transform"], [8, 0, 0, 0, 8, 0]
    )


def test_directional_irradiance_over_pi():
    """XML `irradiance` E contributes L = (E/pi) f cos — matches the
    Tungsten ground truth and the reference's own dragon render (see
    parser._read_emitter); `radiance` passes through unscaled."""
    import textwrap

    from mcpt_tpu.scene.parser import load_config_string

    xml = textwrap.dedent("""\
        <scene version="0.6.0">
          <emitter type="directional">
            <vector name="direction" value="0 -1 0"/>
            <float name="irradiance" value="10.0"/>
          </emitter>
        </scene>""")
    cfg = load_config_string(xml)
    np.testing.assert_allclose(
        cfg.emitters[0].radiance, 10.0 / np.pi, rtol=1e-6
    )


def test_sun_radius_scale_preserves_power():
    """sunRadiusScale enlarges the visible disk but keeps total power
    (Mitsuba semantics; csrt sun_sky.cpp:260-265)."""
    import textwrap

    from mcpt_tpu.scene.parser import load_config_string

    def build(rs):
        xml = textwrap.dedent(f"""\
            <scene version="0.6.0">
              <emitter type="sun">
                <float name="turbidity" value="3"/>
                <vector name="sunDirection" x="0.2" y="0.8" z="0.1"/>
                <float name="sunRadiusScale" value="{rs}"/>
              </emitter>
            </scene>""")
        return load_config_string(xml)

    a = build(1.0)
    b = build(18.8)
    # NEE total power identical
    np.testing.assert_allclose(
        a.emitters[0].radiance, b.emitters[0].radiance, rtol=1e-5
    )
    # bitmap total energy (power seen by escape rays) within a few % —
    # the enlarged disk covers more texels at lower radiance
    def bitmap_energy(cfg):
        px = cfg.textures.bitmap_pixels(cfg.emitters[0].id_texture)
        return float(px.sum())

    ea, eb = bitmap_energy(a), bitmap_energy(b)
    assert eb == pytest.approx(ea, rel=0.25)  # texel quantization at rs=1
