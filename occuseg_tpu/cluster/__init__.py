from occuseg_tpu.cluster.supervoxel import aggregate_regions, RegionFeatures
from occuseg_tpu.cluster.meanshift import meanshift_cluster
from occuseg_tpu.cluster.merge import occupancy_merge
from occuseg_tpu.cluster.refine import (
    joint_refine,
    region_semantic_probability,
)
from occuseg_tpu.cluster.evaluator import (
    instance_average_precision,
    filter_proposals,
    instance_precision_recall,
)
