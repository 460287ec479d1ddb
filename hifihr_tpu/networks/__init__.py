from hifihr_tpu.networks.resnet import ResNet, ResNetEncoder
from hifihr_tpu.networks.heads import HandEncoder, LightEstimator, MMPool
