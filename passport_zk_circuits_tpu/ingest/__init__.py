"""Host-side ingestion: passport parsing, synthetic fixtures, input tensors."""
