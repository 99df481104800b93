from occuseg_tpu.models.occuseg import (
    InstanceDenseUNet,
    LearningBWDenseUNet,
    ThreeVoxelKernel,
    OccuSegOutputs,
)
