// see Importer.hpp
#pragma once
#include "scene.h"
