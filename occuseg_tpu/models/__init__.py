from occuseg_tpu.models.occuseg import (
    ClusterSegNet,
    InstanceDenseUNet,
    LearningBWDenseUNet,
    ThreeVoxelKernel,
    OccuSegOutputs,
)
