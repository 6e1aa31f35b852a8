"""The RSQ quantization pipeline: Hessian statistics, GPTQ/RTN/LDLQ solvers,
token-importance weighting, rotation application, layer-streamed driver."""
