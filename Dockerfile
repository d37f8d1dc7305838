# Container image for basic-pitch-tpu: transcription CLI, training, and ETL.
#
# Parity note: the reference ships a Beam-SDK ETL image
# (/root/reference/Dockerfile) because its dataset pipeline runs on
# Dataflow. This framework's ETL is an in-process multiprocessing pipeline
# (data/pipeline.py), so one image covers all three console scripts.
#
# CPU image (default):
#   docker build -t basic-pitch-tpu .
#   docker run --rm -v $PWD:/work basic-pitch-tpu basic-pitch /work/out /work/song.wav
#
# Serving:
#   docker run --rm -p 8132:8132 basic-pitch-tpu \
#     basic-pitch-serve --host 0.0.0.0 --port 8132
#
# TPU VM variant: build with --build-arg JAX_EXTRA="jax[tpu]" and run with
# the host's TPU runtime exposed (--privileged on a Cloud TPU VM).

FROM python:3.11-slim

# ffmpeg: non-WAV container decode (utils/audio.decode_with_ffmpeg);
# g++: builds the optional native host library (native/bp_native.cpp)
RUN apt-get update \
  && apt-get install --no-install-recommends -y ffmpeg g++ \
  && rm -rf /var/lib/apt/lists/*

ARG JAX_EXTRA="jax"

COPY . /basic-pitch-tpu
WORKDIR /basic-pitch-tpu

RUN pip install --no-cache-dir --upgrade pip setuptools wheel \
  && pip install --no-cache-dir "${JAX_EXTRA}" \
  && pip install --no-cache-dir -e ".[train]"
