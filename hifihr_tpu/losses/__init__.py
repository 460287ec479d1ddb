from hifihr_tpu.losses.basic import (
    bone_direction_loss,
    edge_length_loss,
    tsa_pose_loss,
    iou_loss,
    laplacian_loss,
)
from hifihr_tpu.losses.ssim import ssim
from hifihr_tpu.losses.stack import LossComputer
