"""Serial bitstream front-end: NAL / headers / CABAC / syntax decode."""
