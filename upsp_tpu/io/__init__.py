"""Host-side file-format layer: grids, targets, tunnel data, video, configs."""

from upsp_tpu.io.plot3d import (  # noqa: F401
    StructGrid,
    read_p3d_grid,
    read_p3d_function,
    write_p3d_grid,
    write_p3d_function,
)
from upsp_tpu.io.cart3d import TriMesh, read_tri, write_tri  # noqa: F401
from upsp_tpu.io.tgts import Target, read_tgts, read_tgts_header  # noqa: F401
from upsp_tpu.io.wtd import TunnelConditions, read_wtd, model_temperature  # noqa: F401
from upsp_tpu.io.paint import PaintCalibration  # noqa: F401
from upsp_tpu.io.camera_json import (  # noqa: F401
    CameraCalibration,
    read_camera_json,
    write_camera_json,
    read_test_config,
    read_json,
)
