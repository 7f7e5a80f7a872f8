from ciri_long_tpu.parallel.mesh import (READS_AXIS, LAG_AXIS, make_mesh,
                                         sharded_pipeline_step, sharded_sw)

__all__ = ["READS_AXIS", "LAG_AXIS", "make_mesh", "sharded_sw",
           "sharded_pipeline_step"]
