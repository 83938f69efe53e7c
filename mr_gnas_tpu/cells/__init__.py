from mr_gnas_tpu.cells.compiled import CompiledCell, OpModule
from mr_gnas_tpu.cells.genotype import (
    CellSpec,
    Genotype,
    decode_genotype,
    decode_genotypes,
    genotypes_from_json,
    genotypes_to_json,
    init_alphas,
    layer_weights,
    parse_reference_genotypes,
)
from mr_gnas_tpu.cells.supernet import MixedOp, SupernetCell

__all__ = [
    "CellSpec",
    "CompiledCell",
    "Genotype",
    "MixedOp",
    "OpModule",
    "SupernetCell",
    "decode_genotype",
    "decode_genotypes",
    "genotypes_from_json",
    "genotypes_to_json",
    "init_alphas",
    "layer_weights",
    "parse_reference_genotypes",
]
