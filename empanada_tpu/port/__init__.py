"""Weight porting from the reference PyTorch models."""

from empanada_tpu.port.torch_port import load_torch_checkpoint, port_state_dict

__all__ = ["load_torch_checkpoint", "port_state_dict"]
