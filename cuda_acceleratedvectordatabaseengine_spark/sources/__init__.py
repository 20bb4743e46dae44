"""Source/sink layer: testdata table loading and epoch-versioned index storage."""
