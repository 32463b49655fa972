"""Config-tier performance knobs (VERDICT r4 weak #6): XML <default
name="mcpt.*"> and CLI --set flow into MCPT_* env defaults; explicit
env vars win."""

import os
import textwrap

import numpy as np

from mcpt_tpu.scene.parser import load_config


def _write_scene(tmp_path, extra=""):
    xml = textwrap.dedent(f"""\
        <scene version="0.6.0">
          {extra}
          <sensor type="perspective">
            <float name="fov" value="45"/>
            <film type="hdrfilm">
              <integer name="width" value="8"/>
              <integer name="height" value="8"/>
            </film>
            <sampler type="independent">
              <integer name="sampleCount" value="2"/>
            </sampler>
          </sensor>
          <shape type="rectangle">
            <bsdf type="diffuse"/>
          </shape>
        </scene>
    """)
    p = tmp_path / "scene.xml"
    p.write_text(xml)
    return str(p)


def test_xml_mcpt_defaults_parse(tmp_path):
    cfg = load_config(_write_scene(
        tmp_path,
        '<default name="mcpt.march_block" value="384"/>'
        '<default name="mcpt.traversal" value="pairs"/>',
    ))
    assert cfg.perf == {"march_block": "384", "traversal": "pairs"}


def test_renderer_applies_env_defaults(tmp_path, monkeypatch):
    from mcpt_tpu.render.renderer import Renderer

    cfg = load_config(_write_scene(
        tmp_path, '<default name="mcpt.march_block" value="384"/>'
    ))
    monkeypatch.delenv("MCPT_MARCH_BLOCK", raising=False)
    Renderer(cfg)
    assert os.environ["MCPT_MARCH_BLOCK"] == "384"
    # explicit env wins over the config tier
    monkeypatch.setenv("MCPT_MARCH_BLOCK", "256")
    Renderer(cfg)
    assert os.environ["MCPT_MARCH_BLOCK"] == "256"


def test_cli_set_flag(tmp_path, monkeypatch):
    import mcpt_tpu.cli as cli

    monkeypatch.delenv("MCPT_MARCH_GROUP", raising=False)
    scene = _write_scene(tmp_path)
    out = str(tmp_path / "out.png")
    cli.main(["-i", scene, "-o", out, "-s", "1",
              "--set", "march_group=256"])
    assert os.environ["MCPT_MARCH_GROUP"] == "256"
    assert os.path.exists(out)
