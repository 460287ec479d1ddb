from hifihr_tpu.hand.mano import ManoLayer, regress_joints_frei
