"""False-positive filter model family: CNN+Transformer (Flax), bi-LSTM, SVM."""
