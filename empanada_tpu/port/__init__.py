"""Weight porting from the reference PyTorch models."""

from empanada_tpu.port.torch_port import (
    infer_arch_and_kwargs,
    load_torch_checkpoint,
    port_state_dict,
)

__all__ = ["infer_arch_and_kwargs", "load_torch_checkpoint", "port_state_dict"]
