"""OME-XML plane selection (io/ome.py) over the native TIFF stack.

The reference reads OME-TIFF channels as bare page indexes
(``UnMicst1-5.py:795-797``); for SizeZ==SizeT==1 files (the MCMICRO case)
these tests pin identical behavior, and for real Z/T stacks they pin the
documented divergence: ``--channel c`` selects plane (C=c, Z=0, T=0) per
the OME DimensionOrder instead of an arbitrary mid-stack page.
"""

import numpy as np
import pytest

from unmicst_tpu.io import ome
from unmicst_tpu.io.slides import (
    n_channels, open_channel_source, read_channel,
)
from unmicst_tpu.io.tiff import TiffFile, TiffWriter


def _ome_xml(order, c, z, t):
    return (
        '<?xml version="1.0"?>'
        '<OME xmlns="http://www.openmicroscopy.org/Schemas/OME/2016-06">'
        '<Image ID="Image:0"><Pixels ID="Pixels:0" '
        f'DimensionOrder="{order}" SizeC="{c}" SizeZ="{z}" SizeT="{t}" '
        'SizeX="24" SizeY="16" Type="uint16">'
        "</Pixels></Image></OME>"
    )


def _write_stack(path, planes, description):
    with TiffWriter(str(path), bigtiff=False) as tw:
        for i, p in enumerate(planes):
            tw.write(p, description=description if i == 0 else None)


def test_description_roundtrip(tmp_path, rng):
    img = (rng.rand(16, 24) * 60000).astype(np.uint16)
    path = tmp_path / "d.ome.tif"
    _write_stack(path, [img], "hello OME")
    with TiffFile(str(path)) as tf:
        assert tf.pages[0].description == "hello OME"
        np.testing.assert_array_equal(tf.read_page(0), img)


@pytest.mark.parametrize("order,expected_page", [
    ("XYCZT", 1),  # C fastest: page = c
    ("XYZCT", 2),  # Z fastest: page = c * SizeZ
    ("XYZTC", 4),  # Z then T: page = c * SizeZ * SizeT
])
def test_plane_index_orders(order, expected_page):
    xml = _ome_xml(order, c=3, z=2, t=2)
    assert ome.plane_index(xml, 0, 12) == 0
    assert ome.plane_index(xml, 1, 12) == expected_page


def test_plane_index_fallbacks():
    # no OME-XML, malformed XML, inconsistent page count -> page == channel
    assert ome.plane_index("", 3, 8) == 3
    assert ome.plane_index("<OME><broken", 3, 8) == 3
    assert ome.plane_index(_ome_xml("XYZCT", 2, 2, 1), 3, 9) == 3
    # spec-invalid orders not leading with XY must fall back, not KeyError
    # (r2 review finding: the stride walk would hit 'Y')
    assert ome.plane_index(_ome_xml("XCYZT", 2, 2, 1), 3, 4) == 3
    assert ome.plane_index(_ome_xml("CZTXY", 2, 2, 1), 1, 4) == 1
    # consistent metadata rejects out-of-range channels
    with pytest.raises(IndexError):
        ome.plane_index(_ome_xml("XYCZT", 2, 2, 1), 3, 4)


def test_read_channel_zstack(tmp_path, rng):
    """XYZCT with SizeZ=2: channel 1 must be page 2 (Z=0 of C=1), not the
    reference's page 1 (which is Z=1 of C=0)."""
    planes = [(rng.rand(16, 24) * 60000).astype(np.uint16) for _ in range(4)]
    path = tmp_path / "z.ome.tif"
    _write_stack(path, planes, _ome_xml("XYZCT", c=2, z=2, t=1))
    np.testing.assert_array_equal(
        read_channel(str(path), "ome.tif", 1), planes[2]
    )
    assert n_channels(str(path)) == 2
    with open_channel_source(str(path), "ome.tif", 1) as src:
        np.testing.assert_array_equal(src.read_rows(0, 16), planes[2])


def test_read_channel_plain_multipage(tmp_path, rng):
    """No OME-XML: page == channel, byte-identical to the reference read."""
    planes = [(rng.rand(16, 24) * 60000).astype(np.uint16) for _ in range(3)]
    path = tmp_path / "p.tif"
    _write_stack(path, planes, None)
    for c in range(3):
        np.testing.assert_array_equal(
            read_channel(str(path), "tif", c), planes[c]
        )
    assert n_channels(str(path)) == 3


def test_mcmicro_shape_ome_is_identity(tmp_path, rng):
    """SizeC=n, SizeZ=SizeT=1 (the CI exemplar shape): OME-aware selection
    equals the reference's page==channel for every channel."""
    planes = [(rng.rand(16, 24) * 60000).astype(np.uint16) for _ in range(4)]
    path = tmp_path / "m.ome.tif"
    _write_stack(path, planes, _ome_xml("XYCZT", c=4, z=1, t=1))
    for c in range(4):
        np.testing.assert_array_equal(
            read_channel(str(path), "ome.tif", c), planes[c]
        )


def test_serve_and_batch_use_ome_plane(tmp_path, rng):
    """serve's infer path and batch's probe resolve the same OME-aware
    plane the CLI does (r2 review finding: they bypassed the facade)."""
    import os

    from tests.conftest import REFERENCE
    from unmicst_tpu.io.slides import tiff_plane

    planes = [(rng.rand(64, 72) * 60000).astype(np.uint16) for _ in range(4)]
    path = tmp_path / "s.ome.tif"
    _write_stack(path, planes, _ome_xml("XYZCT", c=2, z=2, t=1))
    with TiffFile(str(path)) as tf:
        assert tiff_plane(tf, 1) == 2
    if not os.path.isdir(os.path.join(REFERENCE, "models")):
        pytest.skip("reference model zoo unavailable")
    from unmicst_tpu.serve import ModelServer

    srv = ModelServer(model_root=os.path.join(REFERENCE, "models"),
                      precision="float32")
    body, meta = srv.infer_tiff_path(str(path), "nucleiDAPI", 1, True, -1)
    assert meta["shape"] == [64, 72]
    # equal to running on the bare (C=1, Z=0) plane directly
    solo = tmp_path / "solo.tif"
    with TiffWriter(str(solo), bigtiff=False) as tw:
        tw.write(planes[2])
    body2, _ = srv.infer_tiff_path(str(solo), "nucleiDAPI", 0, True, -1)
    assert body == body2


def test_namespace_prefixed_ome_root(rng):
    """<ome:OME xmlns:ome=...> roots must parse (the sniff previously
    required a bare '<OME')."""
    from unmicst_tpu.io import ome

    xml = (
        '<ome:OME xmlns:ome="http://www.openmicroscopy.org/Schemas/OME/'
        '2016-06"><ome:Image><ome:Pixels DimensionOrder="XYZCT" SizeC="2"'
        ' SizeZ="2" SizeT="1"/></ome:Image></ome:OME>'
    )
    assert ome.parse_pixels(xml) is not None
    # C=1 under XYZCT: Z varies fastest -> plane = 1*SizeZ = 2
    assert ome.plane_index(xml, 1, 4) == 2


def test_explicit_tiffdata_mapping_wins(rng):
    """Explicit TiffData IFD mappings are authoritative over the
    DimensionOrder walk (OME-TIFF spec)."""
    from unmicst_tpu.io import ome

    xml = (
        '<OME xmlns="http://www.openmicroscopy.org/Schemas/OME/2016-06">'
        '<Image><Pixels DimensionOrder="XYCZT" SizeC="2" SizeZ="2" '
        'SizeT="1">'
        '<TiffData IFD="3" FirstC="0" FirstZ="0" FirstT="0"/>'
        '<TiffData IFD="2" FirstC="1" FirstZ="0" FirstT="0"/>'
        '<TiffData IFD="1" FirstC="0" FirstZ="1" FirstT="0"/>'
        '<TiffData IFD="0" FirstC="1" FirstZ="1" FirstT="0"/>'
        '</Pixels></Image></OME>'
    )
    assert ome.plane_index(xml, 0, 4) == 3
    assert ome.plane_index(xml, 1, 4) == 2


def test_exotic_container_pil_fallback(tmp_path, rng):
    """A PNG named .tif (parser-rejected container) still reads through
    the PIL fallback — the reference's tolerance, regression-pinned."""
    from PIL import Image

    from unmicst_tpu.io.slides import read_channel

    arr = (rng.rand(20, 30) * 255).astype(np.uint8)
    p = str(tmp_path / "fake.tif")
    Image.fromarray(arr).save(p, format="PNG")
    np.testing.assert_array_equal(read_channel(p, "tif", 0), arr)


def _ome_xml_named(names, z=1, t=1, order="XYCZT"):
    chans = "".join(
        f'<Channel ID="Channel:0:{i}"'
        + (f' Name="{n}"' if n is not None else "")
        + ' SamplesPerPixel="1"/>'
        for i, n in enumerate(names)
    )
    return (
        '<?xml version="1.0"?>'
        '<OME xmlns="http://www.openmicroscopy.org/Schemas/OME/2016-06">'
        '<Image ID="Image:0"><Pixels ID="Pixels:0" '
        f'DimensionOrder="{order}" SizeC="{len(names)}" SizeZ="{z}" '
        f'SizeT="{t}" SizeX="24" SizeY="16" Type="uint16">'
        f"{chans}</Pixels></Image></OME>"
    )


def test_channel_names_parse():
    xml = _ome_xml_named(["DAPI", "Lamin", None])
    assert ome.channel_names(xml) == ["DAPI", "Lamin", None]
    # no Channel elements / not OME -> None
    assert ome.channel_names(_ome_xml("XYCZT", 3, 1, 1)) is None
    assert ome.channel_names("plain text") is None
    assert ome.channel_names("") is None


def test_resolve_channel_name():
    xml = _ome_xml_named(["DAPI", "Lamin-B1", "CD45"])
    assert ome.resolve_channel_name(xml, "DAPI") == 0
    assert ome.resolve_channel_name(xml, "CD45") == 2
    # unique case-insensitive fallback
    assert ome.resolve_channel_name(xml, "dapi") == 0
    with pytest.raises(ValueError, match="Lamin-B1"):
        ome.resolve_channel_name(xml, "nope")  # lists available names
    # exact match wins over the folded fallback; a folded-only match
    # hitting several names is ambiguous
    xml2 = _ome_xml_named(["Aa", "aA", "aa"])
    assert ome.resolve_channel_name(xml2, "aa") == 2  # exact
    with pytest.raises(ValueError, match="ambiguous"):
        ome.resolve_channel_name(xml2, "AA")  # folds onto all three
    with pytest.raises(ValueError, match="no channel names"):
        ome.resolve_channel_name(_ome_xml("XYCZT", 3, 1, 1), "DAPI")


def test_cli_channel_name(tmp_path, rng):
    """--channelName resolves through OME metadata and matches the
    equivalent --channel run bit-for-bit (legacy model, z-stack layout
    so name->plane is a real mapping, not identity)."""
    import os

    from tests.conftest import REFERENCE
    from unmicst_tpu import cli
    from unmicst_tpu.io.tiff import imread

    planes = [
        (rng.rand(160, 128) * 60000).astype(np.uint16) for _ in range(4)
    ]
    path = tmp_path / "named.ome.tif"
    # XYZCT, z=2: channel 1 lives at pages 2,3 -> plane_index(1) == 2
    _write_stack(
        path, planes, _ome_xml_named(["DAPI", "Lamin"], z=2, order="XYZCT")
    )
    base = ["--tool", "unmicst-legacy", "--stackOutput",
            "--modelRoot", os.path.join(REFERENCE, "models")]
    assert cli.main(
        [str(path), *base, "--outputPath", str(tmp_path / "a"),
         "--channel", "2"]
    ) == 0
    assert cli.main(
        [str(path), *base, "--outputPath", str(tmp_path / "b"),
         "--channelName", "Lamin"]
    ) == 0
    for k in range(3):
        np.testing.assert_array_equal(
            imread(str(tmp_path / "a" / "named_Probabilities_2.tif"), k),
            imread(str(tmp_path / "b" / "named_Probabilities_2.tif"), k),
        )
    # unknown name: loud error naming the available channels
    with pytest.raises(SystemExit, match="DAPI"):
        cli.main([str(path), *base, "--outputPath", str(tmp_path / "c"),
                  "--channelName", "CD45"])
    # non-OME input: loud error
    plain = tmp_path / "plain.tif"
    _write_stack(plain, planes[:1], None)
    with pytest.raises(SystemExit, match="channelName"):
        cli.main([str(plain), *base, "--outputPath", str(tmp_path / "d"),
                  "--channelName", "DAPI"])
