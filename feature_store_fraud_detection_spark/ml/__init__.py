"""MLlib training/scoring pipeline — the engine-native replacement for the
reference's sklearn preprocessing + PyTorch DeepFraudNet flows."""
