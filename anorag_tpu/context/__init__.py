from anorag_tpu.context.dispatcher import ContextDispatcher
from anorag_tpu.context.packer import ContextPacker
from anorag_tpu.context.scheduler import ContextScheduler, MultiHopContextScheduler
from anorag_tpu.context.structure_pack import StructurePacker

__all__ = ["ContextDispatcher", "ContextPacker", "ContextScheduler",
           "MultiHopContextScheduler", "StructurePacker"]
